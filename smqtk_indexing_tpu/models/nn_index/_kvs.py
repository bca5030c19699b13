"""
Optional external uid<->index KeyValueStore mirrors.

The reference exposes its FAISS index's uid<->idx bookkeeping as two
configurable KeyValueStore plugin slots (``uid2idx_kvs`` / ``idx2uid_kvs``,
/root/reference/smqtk_indexing/impls/nn_index/faiss.py:260-274), so
deployments persist the mapping beside (not inside) the index payload.
Here the mapping always lives inside the index payload (single-artifact
persistence); these slots are a WRITE-THROUGH MIRROR kept for config
compatibility with the reference's three-store layout and for external
inspection — the index never reads them back.
"""
from __future__ import annotations


def sync_uid_kvs(uid2idx_kvs, idx2uid_kvs, uid2row: dict) -> None:
    """Mirror the live uid -> row mapping into the optional external
    stores (no-op when both are None). Called after every mutation and
    load, under the model lock, so the stores always reflect the served
    layout (rows change on compaction/rebuild)."""
    if uid2idx_kvs is not None:
        uid2idx_kvs.clear()
        if uid2row:
            uid2idx_kvs.add_many(uid2row)
    if idx2uid_kvs is not None:
        idx2uid_kvs.clear()
        if uid2row:
            idx2uid_kvs.add_many({i: u for u, i in uid2row.items()})
