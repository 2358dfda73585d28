"""CLI: sample text from a GPT-2 checkpoint with the KV-cached decoder.

    python -m gpt2_vision_language_tpu.cli.sample --ckpt log/ckpts/model_best.npz \
        --prompt "Hello, I'm a language model," --num 4 --length 32
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--prompt", type=str, default="Hello, I'm a language model,")
    p.add_argument("--num", type=int, default=4)
    p.add_argument("--length", type=int, default=32)
    p.add_argument("--top-k", type=int, default=50)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..core.config import GPTConfig
    from ..data.tokenizer import get_tokenizer
    from ..infer.decode import Decoder
    from ..infer.sampling import sample_top_k
    from ..models import gpt2

    cfg = GPTConfig()
    if args.ckpt:
        if args.ckpt.endswith(".pt"):
            from ..ckpt.torch_import import (
                gpt2_from_torch_state_dict,
                load_torch_checkpoint,
            )

            sd, _ = load_torch_checkpoint(args.ckpt)
            params = gpt2_from_torch_state_dict(sd, cfg)
        else:
            from ..ckpt.checkpoint import load_checkpoint

            tree, _ = load_checkpoint(args.ckpt)
            params = jax.tree.map(jnp.asarray, tree["params"])
    else:
        print("[sample] no --ckpt: using random init")
        params = gpt2.init(jax.random.PRNGKey(0), cfg)

    tok = get_tokenizer()
    prompt = tok.encode(args.prompt)
    if args.length <= len(prompt):
        p.error(
            f"--length {args.length} must exceed the prompt length "
            f"({len(prompt)} tokens with tokenizer {tok.name!r})"
        )
    ids = jnp.asarray([prompt] * args.num, jnp.int32)
    dec = Decoder(
        cfg, sample_fn=functools.partial(sample_top_k, k=args.top_k)
    )
    out, _ = dec.generate(
        params, ids, args.length - len(prompt), jax.random.PRNGKey(args.seed)
    )
    for i in range(args.num):
        print(f"sample {i}: {tok.decode(prompt + np.asarray(out[i]).tolist())}")


if __name__ == "__main__":
    main()
