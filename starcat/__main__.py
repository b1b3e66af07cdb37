"""CLI entry point (SURVEY.md ⑳): `python -m starcat <command> ...`.

Commands:
  run       --config cfg2_nuts [key=value ...]   run a preset head
  validate  [--config cfg0_single_star]          oracle vs JAX moment match
  list                                            list presets
"""
from __future__ import annotations

import argparse
import json
import sys


def _parse_overrides(pairs):
    out = {}
    for p in pairs:
        if "=" not in p:
            raise SystemExit(f"override must be key=value, got {p!r}")
        k, v = p.split("=", 1)
        out[k] = v
    return out


def cmd_list(_args):
    from .configs import CONFIGS

    for name, cfg in CONFIGS.items():
        print(f"{name:22s} head={cfg.head:6s} scene={cfg.scene.height}x{cfg.scene.width} "
              f"stars={cfg.n_stars} kmax={cfg.kmax} {cfg.notes}")


def cmd_run(args):
    from .api import sample, summarize_output
    from .configs import CONFIGS, apply_overrides

    if args.config not in CONFIGS:
        raise SystemExit(f"unknown config {args.config!r}; try: {', '.join(CONFIGS)}")
    cfg = apply_overrides(CONFIGS[args.config], _parse_overrides(args.overrides))
    if cfg.head == "oracle":
        cfg = apply_overrides(cfg, {"head": "hmc"})  # oracle preset -> JAX HMC head
    out = sample(cfg, seed=args.seed,
                 checkpoint_path=args.checkpoint, resume=args.resume)
    summ = summarize_output(out)
    record = {
        "config": cfg.name,
        "head": cfg.head,
        "stats": {k: v for k, v in out.stats.items() if k != "truth"},
        "summary": summ,
    }
    print(json.dumps(record, default=float, indent=None))


def cmd_report(args):
    """Run a preset and write trace/corner/reconstruction PNGs (L0 layer)."""
    import numpy as np

    from .api import sample, summarize_output
    from .configs import CONFIGS, apply_overrides
    from .plots import save_report

    if args.config not in CONFIGS:
        raise SystemExit(f"unknown config {args.config!r}; try: {', '.join(CONFIGS)}")
    cfg = apply_overrides(CONFIGS[args.config], _parse_overrides(args.overrides))
    if cfg.head == "oracle":
        cfg = apply_overrides(cfg, {"head": "hmc"})
    _, img = cfg.make_data()
    out = sample(cfg, seed=args.seed, image=img)
    paths = save_report(out, np.asarray(img), args.out_prefix)
    print(json.dumps({"config": cfg.name, "plots": paths,
                      "summary": summarize_output(out)}, default=float))


def cmd_validate(args):
    """Config-0 oracle validation (SURVEY.md §3.6)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from . import diagnostics
    from .configs import CONFIGS
    from .hmc import run_hmc
    from .potential import make_potential_and_grad, unconstrain, constrain
    from oracle.numpy_sampler import run_oracle

    cfg = CONFIGS[args.config]
    truth_theta, img = cfg.make_data()
    x, y, f = constrain(truth_theta, cfg.scene)

    orc = run_oracle(
        np.asarray(img), cfg.scene.psf_sigma, cfg.scene.background,
        cfg.prior.logf_mean, cfg.prior.logf_sigma,
        n_stars=cfg.n_stars, n_chains=4, n_samples=2000, n_warmup=500,
        step_size=0.05, n_leapfrog=15, seed=1, theta0=np.asarray(truth_theta),
    )
    pg = make_potential_and_grad(cfg.scene, img, cfg.prior)
    mask = jnp.ones(cfg.kmax)
    gf = lambda th: pg(th, mask)
    theta0 = truth_theta[None] + 0.01 * jax.random.normal(
        jax.random.key(3), (16,) + truth_theta.shape
    )
    res, _ = run_hmc(jax.random.key(4), gf, theta0, mask, 1000, 500, cfg.hmc)
    draws = np.asarray(res.thetas)
    ok = True
    report = {}
    orc_draws = orc["samples"].reshape(4, -1, cfg.n_stars, 3)
    for j, nm in enumerate(["ux", "uy", "log_flux"]):
        cmp = diagnostics.compare_moments(
            draws[:, :, 0, j], orc_draws[:, :, 0, j], nm
        )
        report[nm] = {"z": cmp["z"], "jax": cmp["a"]["mean"], "oracle": cmp["b"]["mean"]}
        ok &= cmp["z"] < 4.0
    print(json.dumps({"validated": bool(ok), "moments": report}, default=float))
    sys.exit(0 if ok else 1)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="starcat")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list config presets")
    p_list.set_defaults(fn=cmd_list)

    p_run = sub.add_parser("run", help="run a preset")
    p_run.add_argument("--config", required=True)
    p_run.add_argument("--seed", type=int, default=0)
    p_run.add_argument("--checkpoint", default=None,
                       help="orbax block-checkpoint path (SURVEY.md §5.4)")
    p_run.add_argument("--resume", action="store_true",
                       help="continue a crashed run from --checkpoint (§5.3)")
    p_run.add_argument("overrides", nargs="*", help="key=value overrides")
    p_run.set_defaults(fn=cmd_run)

    p_rep = sub.add_parser("report", help="run a preset and save plots")
    p_rep.add_argument("--config", required=True)
    p_rep.add_argument("--seed", type=int, default=0)
    p_rep.add_argument("--out-prefix", default="starcat_report")
    p_rep.add_argument("overrides", nargs="*")
    p_rep.set_defaults(fn=cmd_report)

    p_val = sub.add_parser("validate", help="oracle vs JAX validation")
    p_val.add_argument("--config", default="cfg0_single_star")
    p_val.set_defaults(fn=cmd_validate)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
