#!/usr/bin/env python
"""CRNN OCR demo — tm_crnn equivalent (examples/tm_crnn.cpp).

Conv backbone + stacked LSTMs on the TPU; greedy best-path CTC decode on
the host (the reference app decodes the same way against its charset file).

    python examples/tm_crnn.py [-i word.png] [-w 100]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", default=None)
    ap.add_argument("-i", "--image", default=None)
    ap.add_argument("-w", "--width", type=int, default=100)
    args = ap.parse_args()

    import tengine_tpu as tt
    from tengine_tpu.models.extra import CRNN_CHARSET, build_crnn_graph, ctc_greedy_decode
    from tengine_tpu.utils.config import Options

    if args.image:
        from PIL import Image

        img = np.asarray(
            Image.open(args.image).convert("L").resize((args.width, 32))
        ).astype(np.float32)
        x = ((img - 127.5) / 127.5)[None, None]
    else:
        x = np.random.default_rng(0).standard_normal((1, 1, 32, args.width)).astype(
            np.float32
        )

    if args.model:
        g = tt.load_model(args.model)
        for tid in g.input_tensors:
            if not g.tensors[tid].shape:
                g.tensors[tid].shape = [1, 1, 32, args.width]
    else:
        g, _ = build_crnn_graph(img_w=args.width)

    session = tt.compile_graph(g, Options(precision="fp32"))
    session.run(x)  # warm/compile
    t0 = time.time()
    (logits,) = session.run(x)
    print(f"inference: {(time.time()-t0)*1e3:.2f} ms")
    seq = logits.reshape(-1, len(CRNN_CHARSET))
    text = ctc_greedy_decode(seq)
    print(f"decoded ({seq.shape[0]} steps): {text!r}")


if __name__ == "__main__":
    main()
