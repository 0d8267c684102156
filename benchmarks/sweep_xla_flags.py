#!/usr/bin/env python
"""Sweep XLA/libtpu flag combinations over the flagship bench config.

The flagship forward (plain-conv MAPEncoder, bf16) is XLA-only, so
compiler scheduling/fusion flags are the remaining free lever after the
kernel-level work (CLAUDE.md: XLA norm fusions measured near roofline;
Pallas norm kernels and int8 both tied or lost end-to-end).  Each flag
set runs ``bench.py`` in a fresh subprocess (XLA_FLAGS is read once at
backend init), same batch/iters, and the winner is reported against the
baseline (empty-flags) subprocess run.

Every flag name in SWEEP is probe-verified before its bench run:
unrecognized XLA_FLAGS abort at backend init, which would otherwise
silently burn the slot as a "bench failed" entry.

Axon caveat (measured 08-19): this sweep is a dead lever over the axon
tunnel.  All four candidate flags are rejected by the deployed
libtpu build, and the axon compile helper logs that the TERMINAL's
XLA_FLAGS/LIBTPU_INIT_ARGS override client-set values at remote-compile
time anyway ("terminal's value wins"), so even recognized client flags
would not reach the compiler.  Flag experiments need
`axon launch --extra-libtpu-args` on the terminal side, not this sweep.

Usage: python benchmarks/sweep_xla_flags.py [batch] [iters]
"""

import json
import os
import subprocess
import sys

SWEEP = [
    ("baseline", ""),
    # larger scoped-vmem budget lets the fusion planner keep bigger
    # producer/consumer chains resident (default 16 MiB-class on v5e)
    ("vmem64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem96m", "--xla_tpu_scoped_vmem_limit_kib=98304"),
    # scheduler: overlap HBM prefetch with compute more aggressively
    ("lhs", "--xla_tpu_enable_latency_hiding_scheduler=true"),
    # allow multi-output fusions across reductions (norm stats feed
    # both the normalize and the next conv)
    ("sink", "--xla_tpu_aggressive_opt_barrier_removal=true"),
]


# A wedged axon chip claim can stall a run for many minutes but killing a
# chip-attached process wedges the claim further (CLAUDE.md), so the
# per-run timeout is deliberately very generous rather than aggressive.
RUN_TIMEOUT_S = 2400


def _env_with(flags: str):
    env = dict(os.environ)
    base = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (base + " " + flags).strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (env.get("PYTHONPATH"), repo) if p)
    return env, repo


def probe_flag(name: str, flags: str) -> bool:
    """Backend-init probe: unrecognized XLA_FLAGS abort at init, so a
    cheap ``jax.devices()`` with the flag set tells us whether the
    deployed libtpu/XLA build knows the flag without burning a full
    bench slot."""
    if not flags:
        return True
    env, repo = _env_with(flags)
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, text=True, env=env, cwd=repo,
            timeout=600)
    except subprocess.TimeoutExpired:
        sys.stderr.write(f"[{name}] flag probe timed out\n")
        return False
    if r.returncode != 0:
        sys.stderr.write(f"[{name}] flag rejected by backend init:\n"
                         + r.stderr[-800:] + "\n")
    return r.returncode == 0


def run_one(name: str, flags: str, batch: int, iters: int):
    env, repo = _env_with(flags)
    print(f"[{name}] starting: XLA_FLAGS={flags or '(default)'}",
          flush=True)
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "bench.py"),
             str(batch), str(iters)],
            capture_output=True, text=True, env=env, cwd=repo,
            timeout=RUN_TIMEOUT_S)
    except subprocess.TimeoutExpired:
        sys.stderr.write(f"[{name}] bench timed out after "
                         f"{RUN_TIMEOUT_S}s (wedged chip claim?)\n")
        return None
    value = None
    for line in r.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                value = json.loads(line)["value"]
            except (KeyError, ValueError):
                pass
    if value is None:
        sys.stderr.write(f"[{name}] bench failed rc={r.returncode}\n"
                         + r.stdout[-2000:] + r.stderr[-2000:])
    return value


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    results = {}
    for name, flags in SWEEP:
        if not probe_flag(name, flags):
            results[name] = None
            print(f"{name:10s} {flags:55s} SKIPPED (flag not in this "
                  "XLA/libtpu build)", flush=True)
            continue
        v = run_one(name, flags, batch, iters)
        results[name] = v
        print(f"{name:10s} {flags or '(default)':55s} "
              f"{v if v is not None else float('nan'):9.1f} crops/s",
              flush=True)
    base = results.get("baseline")
    if base:
        best = max((v, k) for k, v in results.items() if v)
        print(f"best: {best[1]} at {best[0]:.1f} crops/s "
              f"({100 * (best[0] / base - 1):+.1f}% vs baseline)")


if __name__ == "__main__":
    main()
