"""CLI table drivers preserving the reference's entry-point contracts:

    python mr_gan.py --tables 1 3 5 6 [-v]     (mr_gan.py:236-342)
    python mr_nn.py  --tables 2 4 [-v]         (mr_nn.py:121-169)
    python mr_svm.py --tables 2 4 [-v]         (mr_svm.py:118-166)

with the same protocols (stratified 6-fold, LOO-over-72, percent grids,
duration grids, unlabeled grid) and the same stdout format — plus TPU-era
additions the reference lacks: sweep checkpointing (--checkpoint), structured
metrics (--metrics), synthetic-data mode (--synthetic), and mesh-sharded
fold/work parallelism.
"""
