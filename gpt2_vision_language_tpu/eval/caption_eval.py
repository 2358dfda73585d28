"""Caption-generation evaluation (CIDEr / METEOR) over COCO val.

Reference: evaluate_cider (gpt2_linear/data.py:68-135) — first 500 val
images, prompt "A photo of", 24 new tokens, temperature 0.8 + top-p 0.9,
scored by CIDEr against the raw reference captions.

TPU re-design: the reference generates image-by-image with a full
re-forward per token (500 x 24 forwards). Here images are processed in
BATCHES through the KV-cached Decoder — two jitted calls per batch
(prefill + scan decode loop) instead of 12,000 forwards.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import BridgeConfig, GPTConfig
from ..core.precision import Policy, DEFAULT_POLICY
from ..data.coco import CocoClipTokensDataset
from ..infer.decode import Decoder, cast_decode_params
from ..infer.sampling import sample_top_p_fast
from ..models import caption, gpt2
from ..ops.pooling import pool_clip_tokens_to_33
from .cider import CiderScorer
from .meteor import meteor_score, synonym_provenance


def evaluate_captions(
    gpt_params,
    bridge_params,
    dataset: CocoClipTokensDataset,
    cfg: GPTConfig,
    bridge_cfg: Optional[BridgeConfig],
    tokenizer,
    *,
    max_samples: int = 500,
    max_new_tokens: int = 24,
    batch_size: int = 50,
    prompt: str = "A photo of",
    policy: Policy = DEFAULT_POLICY,
    seed: int = 0,
    compute_meteor: bool = False,
    feature_bank=None,
    decoder: Optional[Decoder] = None,
) -> Dict[str, object]:
    """-> {"cider": float, "meteor": float?, "captions": {idx: str}}.

    bridge_cfg None => gated cross-attention variant (z memory instead of
    prefix; gpt2_cross-att/data.py eval path).
    """
    n_eval = min(max_samples, len(dataset))
    # A Decoder owns its jit caches — callers evaluating repeatedly MUST
    # pass one in, or every eval recompiles the prefill/decode graphs
    # (measured: ~3 min per eval on the remote-compile TPU tunnel).
    decoder = decoder or Decoder(cfg, policy=policy, sample_fn=sample_top_p_fast)
    # Serve from compute-dtype weight storage: halves the per-token HBM
    # read, matmul-bit-identical under the policy (no-op at fp32 policy —
    # see cast_decode_params). One-time 0.25 GB copy per eval at 124M,
    # repaid ~24x over by the decode loop's per-step param reads.
    gpt_params = cast_decode_params(gpt_params, policy)
    if bridge_params is not None:
        bridge_params = cast_decode_params(bridge_params, policy)
    prompt_ids = tokenizer.encode(prompt)
    rng = jax.random.PRNGKey(seed)

    gts: Dict[int, List[str]] = {}
    res: Dict[int, List[str]] = {}
    for start in range(0, n_eval, batch_size):
        idxs = list(range(start, min(start + batch_size, n_eval)))
        if feature_bank is not None:
            z = feature_bank[jnp.asarray(idxs)]
        else:
            feats = np.stack([dataset.features(i) for i in idxs])
            z = pool_clip_tokens_to_33(jnp.asarray(feats))
        ids = jnp.asarray([prompt_ids] * len(idxs), jnp.int32)
        rng, sub = jax.random.split(rng)
        if bridge_cfg is not None:
            toks = caption.generate_captions(
                gpt_params,
                bridge_params,
                z,
                ids,
                cfg,
                bridge_cfg,
                sub,
                max_new_tokens=max_new_tokens,
                policy=policy,
                decoder=decoder,
            )
        else:
            # xattn variant: project visual tokens once (gpt2.apply does this
            # internally for training; forward_cached expects projected z)
            from ..ops.layers import linear

            zp = linear(
                z,
                gpt_params["vis_proj"]["w"],
                gpt_params["vis_proj"]["b"],
                policy=policy,
            ).astype(policy.compute_dtype)
            toks, _ = decoder.generate(gpt_params, ids, max_new_tokens, sub, z=zp)
        toks = np.asarray(toks)
        for row, i in enumerate(idxs):
            gts[i] = list(dataset.coco[i])
            res[i] = [tokenizer.decode(toks[row].tolist())]

    out: Dict[str, object] = {}
    out["cider"], _ = CiderScorer().compute_score(gts, res)
    if compute_meteor:
        out["meteor"], _ = meteor_score(gts, res)
        # scores are only cross-machine comparable at matching synonym
        # provenance (file:<path> / nltk-wordnet / builtin)
        out["meteor_synonyms"] = synonym_provenance()
    out["captions"] = {i: res[i][0] for i in res}
    return out
