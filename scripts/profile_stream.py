"""Superseded by profile_stream2.py (async pipelined slopes; one
compile per stage instead of device-loop chains). Kept as a forwarding
shim so older run notes keep working."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_stream2 import main  # noqa: E402,F401

if __name__ == "__main__":
    nnz = int(sys.argv[1]) if len(sys.argv) > 1 else 3_300_000
    main(nnz)
