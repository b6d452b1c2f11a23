"""Minibatch GraphSAGE with neighbour sampling — parity with ``graphage.py`` and
``examples/graphsage`` in the reference.

    python examples/minibatch_graphsage.py [--fanouts 10,5 --batch_size 512 ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys

from dgll_tpu.run import main

if __name__ == "__main__":
    sys.argv = [sys.argv[0], "--Model", "GraphSAGE", "--samp_type", "neighbor"] + sys.argv[1:]
    main()
