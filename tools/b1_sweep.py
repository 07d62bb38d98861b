#!/usr/bin/env python
"""Raw t(n) sweep for the b1 measurement study: is dispatch-pipelined wall
time actually linear in n on this tunneled platform?"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from b1_study import run_n, setup


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "mobilenetv1"
    scheme = sys.argv[2] if len(sys.argv) > 2 else "uint8"
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    call, sync = setup(model, scheme, batch)
    run_n(call, sync, 3)
    ns = [1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024]
    for rep in range(3):
        row = []
        for n in ns:
            t = run_n(call, sync, n)
            row.append(t * 1e3)
        print("  ".join(f"{n}:{t:8.1f}" for n, t in zip(ns, row)), flush=True)
    # incremental slopes from consecutive n (3rd rep)
    print("pairwise slopes ms/iter:",
          "  ".join(f"{ns[i]}-{ns[i+1]}:{(row[i+1]-row[i])/(ns[i+1]-ns[i])*1e3:.3f}"
                    for i in range(len(ns) - 1)))


if __name__ == "__main__":
    main()
