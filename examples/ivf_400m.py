"""
IVF residual-OPQ16 at 400M vectors on ONE chip — the demonstrated
capacity point of the code tier (the reference's 'OPQ16,IVF16384,PQ16'
FAISS factory role, /root/reference/smqtk_indexing/impls/nn_index/
faiss.py:190, at a scale CPU FAISS would serve from ~6.4GB of codes).

This is examples/ivf_100m.py at 64 chunks (402,653,184 rows) with the
SQ8 phase skipped (an int8-per-dim mirror would need N bytes = 51GB of
HBM; the PQ capacity tier is the point at this scale):

- HBM residency: 6.0GB uint8 codes + 1.5GB f32 row stats (~7.5GB of a
  16GB v5e chip; the extrapolated one-chip ceiling with f32 stats is
  ~700M rows, ~790M with bf16 stats — see docs/benchmarks.md Config 5c).
- Build: assignment-only pass (per-list lengths for the CSR), then the
  two-pass sorted-regeneration PQ ingest per chunk; OPQ rotation +
  codebooks train on a residualized 1M-row sample (ops/opq.opq_train).
- Serving: ivf_query_dma_tiled_table_pq (in-kernel one-hot ADC), score
  mode, B=128 and B=1024 rows; recall vs the wide-probe ADC oracle over
  the same codes (the float-data oracle needs the SQ8 phase; codec loss
  at this mixture is quantified at 100M — docs Config 5b).

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python \
    examples/ivf_400m.py
Raw-PQ / no-OPQ variants: SMQTK_IVF100M_OPQ=0 SMQTK_IVF100M_RAW_PQ=1.
"""
import os
import runpy

os.environ.setdefault("SMQTK_IVF100M_CHUNKS", "64")
os.environ.setdefault("SMQTK_IVF100M_NO_SQ8", "1")
if os.environ.get("SMQTK_IVF100M_OPQ", "1") != "0":
    os.environ["SMQTK_IVF100M_OPQ"] = "1"
else:
    os.environ.pop("SMQTK_IVF100M_OPQ", None)

if __name__ == "__main__":
    runpy.run_path(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "ivf_100m.py"), run_name="__main__")
