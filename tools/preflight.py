"""Round-end preflight: everything that must be green before the final
commit of a build round (VERDICT r4 #7 — the r4 snapshot landed 526 lines
of never-executed code; both bugs were catchable by the existing suite).

Runs, in order, on the CPU backend (no TPU contention, safe anywhere):
  1. a compile smoke of the driver contract: `__graft_entry__.entry()`
     abstract-evaluates under jit (no device execution — catches
     ConcretizationTypeError-class breakage in the flagship step without
     touching the chip), plus an import + one-call smoke of the
     decode/sampler production path (Decoder + sample_top_p_fast under
     jit — the exact surface the r4 regression broke),
  2. `dryrun_multichip(8)` on the virtual mesh (the full dp x tp x sp
     train-step sharding compiles AND executes one tiny step) — run
     BEFORE the suite on a fresh host, with one retry for the
     rendezvous-starvation flake (r5),
  3. the full test suite (`python -m pytest tests/ -q`).

Usage:  python tools/preflight.py [--fast]
  --fast skips the test suite (steps 2-4 only, ~1 min) for mid-round
  sanity; the final commit of a round MUST run the full thing.

Exit code 0 = safe to commit. Anything else: do not land.
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPU_ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    XLA_FLAGS=(
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
        # 1-core host: XLA:CPU's collective rendezvous SIGABRTs when a
        # device thread is starved past the terminal timeout. The dryrun's
        # own default (600 s) was exceeded once when it ran right after
        # the test suite (r5); pre-set 1200 s here — __graft_entry__ only
        # appends its values when the keys are absent.
        + " --xla_cpu_collective_timeout_seconds=1200"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    ).strip(),
)


def run(name, argv, env=None):
    t0 = time.time()
    print(f"[preflight] {name} ...", flush=True)
    r = subprocess.run(argv, cwd=REPO, env=env or CPU_ENV)
    dt = time.time() - t0
    status = "OK" if r.returncode == 0 else f"FAIL (exit {r.returncode})"
    print(f"[preflight] {name}: {status} ({dt:.0f}s)", flush=True)
    return r.returncode == 0


SMOKE = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import __graft_entry__ as g

# entry() must abstract-eval under jit (catches trace-time crashes in the
# flagship forward without running anything)
fn, args = g.entry()
jax.make_jaxpr(fn)(*args)
print("entry() traces OK")

# the production sampler path, jitted, exactly as infer/decode.py runs it
from gpt2_vision_language_tpu.infer.sampling import sample_top_p_fast
logits = jax.random.normal(jax.random.PRNGKey(0), (4, 50304))
tok = jax.jit(sample_top_p_fast)(jax.random.PRNGKey(1), logits)
assert tok.shape == (4,), tok.shape
print("jitted sample_top_p_fast OK")

from gpt2_vision_language_tpu.core.config import GPTConfig
from gpt2_vision_language_tpu.core.precision import FP32_POLICY
from gpt2_vision_language_tpu.infer.decode import Decoder
from gpt2_vision_language_tpu.models import gpt2
cfg = GPTConfig(block_size=32, vocab_size=96, n_layer=2, n_head=2, n_embd=32)
params = gpt2.init(jax.random.PRNGKey(0), cfg)
dec = Decoder(cfg, policy=FP32_POLICY, sample_fn=sample_top_p_fast)
out, _ = dec.generate(
    params, jnp.zeros((2, 3), jnp.int32), 4, jax.random.PRNGKey(2)
)
assert out.shape == (2, 4)
print("Decoder(sample_top_p_fast) OK")
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="skip the full test suite (NOT valid for the "
                         "final commit of a round)")
    args = ap.parse_args()

    ok = True
    # Order: contract smokes + dryrun FIRST, on a fresh uncontended host —
    # running the dryrun right after the 35-min suite starved one of its 8
    # device threads past the rendezvous terminal timeout once (r5,
    # SIGABRT in AwaitAndLogIfStuck; the isolated rerun passed with the
    # bit-pinned loss). Suite last also surfaces driver-contract breakage
    # in the first ~10 min of the gate instead of the last.
    ok &= run("entry()+sampler smoke", [sys.executable, "-c", SMOKE])
    dry = [sys.executable, "-c",
           "import __graft_entry__ as g; g.dryrun_multichip(8)"]
    if not run("dryrun_multichip(8)", dry):
        # one retry for the known starvation flake: a genuine breakage
        # (shape/spec/collective mismatch) is deterministic and fails
        # again; only scheduling starvation is transient
        print("[preflight] WARNING: dryrun failed once — retrying (the "
              "rendezvous-starvation flake is transient; real breakage "
              "fails deterministically)", flush=True)
        ok &= run("dryrun_multichip(8) retry", dry)
    if not args.fast:
        ok &= run("test suite", [sys.executable, "-m", "pytest", "tests/", "-q"])
    print(f"[preflight] {'ALL GREEN — safe to commit' if ok else 'RED — do not land'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
