"""Train vbcar from the command line.

Mirrors the reference per-model CLI (reference examples/train_vbcar.py); all
flags of the generic runner apply (--dataset, --batch_size, --lr, --tune ...).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from train_model import run_model

if __name__ == "__main__":
    run_model("vbcar")
