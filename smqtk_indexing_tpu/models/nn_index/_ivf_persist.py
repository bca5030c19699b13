"""
Persistence engine for IvfNearestNeighborsIndex: the npz payload format
(header JSON + codes/matrix + codec arrays), save-on-mutation and
load-at-construction (reference contract: FAISS index bytes + params
into DataElements, faiss.py:398-484; build overwrites persistent
storage, interfaces/nearest_neighbor_index.py:18-21). Extracted from
models/nn_index/ivf.py (round-5 split; the class keeps thin delegates).
"""
from __future__ import annotations

import io
import json
import logging

import numpy as np

from smqtk_indexing_tpu.data.exceptions import ReadOnlyError

LOG = logging.getLogger("smqtk_indexing_tpu.models.nn_index.ivf")


def save_index(idx) -> None:
    if idx.index_element is None:
        return
    if idx.index_element.is_read_only():
        raise ReadOnlyError(
            f"Index element {idx.index_element} is read-only.")
    header = json.dumps({"metric": idx.metric,
                         "storage": idx.storage,
                         "dim": idx._dim,
                         "pq_residual": idx.pq_residual}).encode()
    bio = io.BytesIO()
    if idx._host is None:
        np.savez(bio, empty=np.array(True))
    else:
        keep = np.flatnonzero(idx._valid_host)
        extra = {}
        if idx._code_a is not None:
            # 'code' tier: the payload is the int8 codes + the codec
            # that decodes them — float originals are never persisted
            # (rebuild-from-codes; FAISS serializes SQ codes the same
            # way, faiss.py:368-386).
            extra = {"code_a": idx._code_a, "code_b": idx._code_b}
        elif idx._code_cb is not None:
            # PQ 'code' tier: uint8 codes + codebooks (the dim
            # interleave is deterministic from the padded dim —
            # _pq_grid — so only the codebooks persist) + the OPQ
            # rotation when the codec is rotated.
            extra = {"code_cb": idx._code_cb}
            if idx._code_rot is not None:
                extra["code_rot"] = idx._code_rot
        np.savez(bio,
                 matrix=idx._host[keep],
                 uids=np.array([idx._row2uid[i] for i in keep],
                               dtype=object),
                 centroids=idx._centroids_np,
                 assigns=idx._assign_host[keep],
                 **extra)
    body = bio.getvalue()
    idx.index_element.set_bytes(
        len(header).to_bytes(8, "big") + header + body)


def load_index(idx) -> None:
    if idx.index_element is None or idx.index_element.is_empty():
        return
    payload = idx.index_element.get_bytes()
    hlen = int.from_bytes(payload[:8], "big")
    header = json.loads(payload[8:8 + hlen].decode())
    if header.get("metric") != idx.metric:
        LOG.warning(
            "Loaded IVF index was built with metric %r; instance is "
            "configured with %r — centroids/layout may not suit the "
            "configured metric.", header.get("metric"), idx.metric)
    with np.load(io.BytesIO(payload[8 + hlen:]),
                 allow_pickle=True) as z:
        if "empty" in z:
            return
        mat = z["matrix"]
        uids = list(z["uids"])
        idx._centroids_np = z["centroids"]
        assigns = z["assigns"].astype(np.int32)
        code_a = z["code_a"] if "code_a" in z else None
        code_b = z["code_b"] if "code_b" in z else None
        code_cb = z["code_cb"] if "code_cb" in z else None
        code_rot = z["code_rot"] if "code_rot" in z else None
    if mat.dtype == np.uint8 and code_cb is not None:
        # PQ-code payload: the row width is the subquantizer count,
        # not the descriptor dim — recover dim from the header. The
        # centroid width is LANE-PADDED and must not be trusted as a
        # fallback (queries at the true width would then be rejected
        # by the dim check); for dim-less legacy payloads recover the
        # true width from a stored descriptor instead, else refuse.
        if "dim" in header:
            idx._dim = int(header["dim"])
        else:
            idx._dim = idx._dim_from_descriptor_set()
            if idx._dim is None:
                raise ValueError(
                    "PQ-code index payload lacks a 'dim' header and "
                    "the descriptor set is empty — the true vector "
                    "width cannot be recovered (the centroid width "
                    "is lane-padded). Re-save the index with a "
                    "current build to add the header.")
    else:
        idx._dim = int(mat.shape[1])
    if mat.dtype == np.int8 and code_a is not None:
        if idx.storage == "code" \
                and idx._pq_m(idx.dtype) is None:
            # Codes + codec restore directly (no float originals ever
            # existed on disk — the capacity contract).
            idx._code_a, idx._code_b = code_a, code_b
        else:
            # Payload written by a 'code' instance, loaded by a
            # 'rows' (or differently-coded) one: decode to float
            # (lossy only by the SQ8 step the codes already carry).
            mat = mat.astype(np.float32) * code_a[None, :] \
                + code_b[None, :]
    elif mat.dtype == np.uint8 and code_cb is not None:
        if idx.storage == "code" \
                and idx._pq_m(idx.dtype) is not None:
            # The serialized index defines the codec (FAISS read
            # semantics): adopt the payload's codebooks (+ rotation
            # + residual flag — decoding with the wrong frame would
            # silently corrupt every distance).
            idx._code_cb = np.asarray(code_cb, np.float32)
            if code_rot is not None:
                idx._code_rot = np.asarray(code_rot, np.float32)
            # Default FALSE for legacy payloads (saved before the
            # flag existed, i.e. raw codes): falling back to the
            # instance flag would serve raw codes as residuals.
            idx.pq_residual = bool(header.get("pq_residual", False))
        else:
            from smqtk_indexing_tpu.ops.device import pad_rows_np
            from smqtk_indexing_tpu.ops.pq import pq_decode_np
            x_c = pq_decode_np(mat, np.asarray(code_cb, np.float32))
            if code_rot is not None:
                # Reconstructions live in the rotated codec space;
                # rotate back before un-interleaving.
                x_c = x_c @ np.asarray(code_rot, np.float32).T
            d_codec = x_c.shape[1]
            m_pay = code_cb.shape[0]
            perm = np.argsort(np.arange(d_codec) % m_pay,
                              kind="stable")
            if header.get("pq_residual"):
                # Residual payload: codes carried x_T - c_T[list];
                # add the (perm-space) centroid back.
                x_c = x_c + pad_rows_np(
                    idx._centroids_np.astype(np.float32),
                    idx._centroids_np.shape[0], d_codec
                )[:, perm][assigns]
            mat = np.ascontiguousarray(
                x_c[:, np.argsort(perm)][:, :idx._dim])
    idx._layout(mat, uids, assigns)
    if idx.descriptor_set.count() != idx._n_live:
        LOG.warning(
            "Descriptor set size (%d) disagrees with loaded index size "
            "(%d); repopulating from index payload.",
            idx.descriptor_set.count(), idx._n_live)
        from smqtk_indexing_tpu.data.descriptor import (
            DescriptorMemoryElement,
        )
        idx.descriptor_set.clear()
        idx.descriptor_set.add_many_descriptors(
            DescriptorMemoryElement(idx._row2uid[i],
                                    idx._row_vector(i))
            for i in np.flatnonzero(idx._valid_host))
    idx._sync_kvs()
