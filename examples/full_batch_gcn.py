"""Full-batch GCN training — parity with ``examples/gcn`` in the reference.

    python examples/full_batch_gcn.py [--dataset synthetic --n_epochs 100 ...]

With a planetoid-format dataset directory (``--dataset path/to/cora``) this is the
cora/citeseer/pubmed flow; the default synthetic SBM reproduces the same pipeline
without data downloads (accuracy target >0.75, cf. reference cora ~0.810).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys

from dgll_tpu.run import main

if __name__ == "__main__":
    sys.argv = [sys.argv[0], "--Model", "GCN", "--samp_type", "full"] + sys.argv[1:]
    main()
