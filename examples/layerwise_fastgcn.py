"""Layer-wise importance-sampled training (FastGCN / LADIES + flat/WRS variants) —
parity with the reference's MQFastGCN*/MQLadies* entry points.

    python examples/layerwise_fastgcn.py --samp_type fastgcn --n_samp 512
    python examples/layerwise_fastgcn.py --samp_type ladies --flatten --wrs \
        --samp_growth_rate 2.0
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys

from dgll_tpu.run import main

if __name__ == "__main__":
    args = sys.argv[1:]
    if not any(a.startswith("--samp_type") for a in args):
        args = ["--samp_type", "fastgcn"] + args
    sys.argv = [sys.argv[0], "--Model", "GCN"] + args
    main()
