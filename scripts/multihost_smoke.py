"""Multi-host smoke test (SURVEY.md §4.2 "Multi-host smoke"): launch this
script once per process to exercise the jax.distributed init + collective
handshake that a real multi-host v5e pod run uses (SURVEY.md §5.8).

    python scripts/multihost_smoke.py --num-processes 2 --process-id 0 &
    python scripts/multihost_smoke.py --num-processes 2 --process-id 1

Runs on CPU (one device per process) by default, so it works on any machine;
on a real pod slice drop --force-cpu and the same code rides ICI/DCN.
Exit code 0 on every process means the collective mesh works.
"""
from __future__ import annotations

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="127.0.0.1:9911")
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--force-cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n = jax.device_count()
    assert n >= args.num_processes, (n, args.num_processes)
    mesh = Mesh(np.array(jax.devices()), ("chains",))

    # one global array sharded over all processes' devices; psum-style mean
    local = jnp.full((4,), float(jax.process_index()))
    arrs = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("chains")), np.asarray(local)
    )

    @jax.jit
    def pooled(x):
        return x.mean()  # lowers to a cross-host collective

    out = float(pooled(arrs))
    expect = sum(range(args.num_processes)) / args.num_processes
    ok = abs(out - expect) < 1e-6
    print(f"[process {args.process_id}] devices={n} pooled={out} expect={expect} ok={ok}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
