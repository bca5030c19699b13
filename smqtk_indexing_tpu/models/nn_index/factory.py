"""
FAISS-style factory-string construction.

Convenience parity with the reference's ``factory_string`` configuration
surface (/root/reference/smqtk_indexing/impls/nn_index/faiss.py:182-199 —
``faiss.index_factory('IDMap,Flat')`` etc.): maps the common factory
strings onto the TPU-native implementations so configs written against the
FAISS wrapper translate mechanically.

Supported grammar (comma-separated, 'IDMap' prefix ignored — UID mapping is
always on here):

- ``Flat``                      -> FlatNearestNeighborsIndex
- ``SQ8``                       -> FlatNearestNeighborsIndex(dtype='sq8')
  (int8 scalar quantization, 4x capacity — the FAISS ``SQ8`` codec)
- ``IVF<nlist>,Flat``           -> IvfNearestNeighborsIndex(n_lists=nlist)
- ``IVF<nlist>,SQ8``            -> IvfNearestNeighborsIndex(n_lists=nlist,
  dtype='sq8')

``PQ<x>`` raises ValueError pointing at SQ8: on TPU, product-quantization
ADC tables are a poor fit for the MXU (PARITY.md "Known gaps") while SQ8
serves the same capacity axis in matmul form.
"""
from __future__ import annotations

import re
from typing import Any

from smqtk_indexing_tpu.models.nn_index.flat import FlatNearestNeighborsIndex
from smqtk_indexing_tpu.models.nn_index.ivf import IvfNearestNeighborsIndex

_METRIC_MAP = {
    # Reference metric labels (faiss.py:51-67) -> our metric names.
    "l2": "euclidean",
    "euclidean": "euclidean",
    "ip": "inner_product",
    "inner_product": "inner_product",
    "cosine": "cosine",
}


def index_from_factory_string(factory_string: str,
                              metric: str = "l2",
                              **kwargs: Any):
    """
    Build an index from a FAISS-style factory string.

    :param factory_string: e.g. ``'Flat'``, ``'IDMap,Flat'``,
        ``'IVF4096,Flat'``.
    :param metric: Reference metric label ('l2' | 'ip' | 'cosine' | ...).
    :param kwargs: Forwarded to the implementation constructor.
    :raises ValueError: Unsupported factory string or metric label.
    """
    if metric.lower() not in _METRIC_MAP:
        raise ValueError(
            f"Unsupported metric label {metric!r}; "
            f"supported: {sorted(_METRIC_MAP)}")
    m = _METRIC_MAP[metric.lower()]
    parts = [p.strip() for p in factory_string.split(",")
             if p.strip() and p.strip().lower() != "idmap"]
    codecs = {"flat": "float32", "sq8": "sq8"}
    if len(parts) == 1 and parts[0].lower() in codecs:
        return FlatNearestNeighborsIndex(
            metric=m, dtype=codecs[parts[0].lower()], **kwargs)
    ivf = re.fullmatch(r"IVF(\d+)", parts[0], flags=re.IGNORECASE)
    if ivf and len(parts) == 2 and parts[1].lower() in codecs:
        return IvfNearestNeighborsIndex(
            metric=m, n_lists=int(ivf.group(1)),
            dtype=codecs[parts[1].lower()], **kwargs)
    if any(re.fullmatch(r"PQ\d+x?\d*", p, flags=re.IGNORECASE)
           for p in parts):
        raise ValueError(
            f"Product quantization ({factory_string!r}) is not provided: "
            "PQ ADC lookup tables are a poor fit for the TPU MXU. Use the "
            "'SQ8' codec for the same 4x-capacity axis in matmul form "
            "(e.g. 'SQ8', 'IVF4096,SQ8').")
    raise ValueError(
        f"Unsupported factory string {factory_string!r}; supported: "
        "'Flat', 'IDMap,Flat', 'SQ8', 'IDMap,SQ8', 'IVF<nlist>,Flat', "
        "'IVF<nlist>,SQ8'.")
