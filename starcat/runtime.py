"""Runtime program-size limits (VERDICT round-4 item 6).

On THIS environment (a single v5e chip reached through the axon tunnel)
the TPU worker crashes when a single device program grows too large —
observed on >=250-step XLA Riemannian sampling scans at >=256 chains, on
256-chain x 400-step warmup scans with the full-metric RHMC body, and on
whole-pass SMC while_loops (round 3/4 records).  That is a pathology of
this VM's tunnel transport, NOT a TPU fact: a native TPU host is expected
to run far larger programs, and chopping loops into ~100-step programs
costs ~20 ms of dispatch latency each plus lost cross-iteration fusion.

Round 4 hard-coded the safe limits behind `jax.default_backend() ==
"tpu"` sniffs in three places (smc.py / driver.py / api.py).  This module
replaces those with ONE knob so a deployment can lift the limits:

    STARCAT_MAX_PROGRAM_STEPS=<n>   cap scan/loop bodies at n steps per
                                    compiled program (n <= 0: unlimited)

Unset, the default stays the measured-safe behavior: 100 steps on the
tpu backend, unlimited elsewhere (CPU fake-mesh tests keep the fused
single-program GSPMD paths).  See docs/DESIGN.md "Program-size limits".
"""
from __future__ import annotations

import os

import jax

# measured-safe cap for this VM's axon tunnel (rounds 3-4): 100-step
# programs never crashed the worker; 250-step ones did on the heavy bodies
DEFAULT_TPU_MAX_PROGRAM_STEPS = 100

_ENV_VAR = "STARCAT_MAX_PROGRAM_STEPS"


def max_program_steps() -> int | None:
    """Per-program step cap for scan/loop-heavy device programs.

    None means unlimited (fuse whole passes into one program — the GSPMD
    multi-chip reference path).  Reads STARCAT_MAX_PROGRAM_STEPS on every
    call so tests and long-lived processes can adjust it.
    """
    env = os.environ.get(_ENV_VAR, "").strip()
    if env:
        v = int(env)
        return None if v <= 0 else v
    if jax.default_backend() == "tpu":
        return DEFAULT_TPU_MAX_PROGRAM_STEPS
    return None


def cap_block(block: int | None, fallback: int) -> int:
    """Resolve a block size against the program-step cap.

    block=None means "one program" (use fallback as its length); the cap,
    when set, bounds the result.
    """
    n = fallback if block is None else block
    cap = max_program_steps()
    return n if cap is None else min(n, cap)
