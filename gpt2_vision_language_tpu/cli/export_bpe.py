"""CLI: serialize tiktoken's GPT-2 BPE tables for offline use.

    python -m gpt2_vision_language_tpu.cli.export_bpe --out gpt2_bpe

Run once on a machine with network (or a warm tiktoken cache); copy the
resulting directory to the pod and set GPT2_BPE_DIR to it. Air-gapped runs
then use the real GPT-2 vocabulary (reference: train_gpt2.py:241) through
data.tokenizer.LocalBpeTokenizer instead of the byte-fallback.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="gpt2_bpe", help="output directory")
    args = p.parse_args(argv)

    from ..data.bpe_export import export_bpe

    export_bpe(args.out)
    print(f"wrote {args.out}/encoder.json and {args.out}/vocab.bpe")
    print(f"set GPT2_BPE_DIR={args.out} to use them")


if __name__ == "__main__":
    main()
