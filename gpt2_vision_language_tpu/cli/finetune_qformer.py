"""CLI: BLIP-2-style Q-Former bridge COCO fine-tune (reference: source/gpt2_q_former/train.py).

    python -m gpt2_vision_language_tpu.cli.finetune_qformer --init-ckpt ... [--synthetic]
"""

from __future__ import annotations

from ._finetune_common import apply_common, build_parser, run


def main(argv=None):
    args = build_parser(__doc__).parse_args(argv)
    from ..core.config import finetune_qformer_preset

    cfg = apply_common(finetune_qformer_preset(), args)
    run(cfg, args)


if __name__ == "__main__":
    main()
