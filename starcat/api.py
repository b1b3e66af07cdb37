"""High-level API (SURVEY.md §1.2 "API / drivers"): one entry point that
builds the scene/potential and dispatches to any head by name — the
`sample(cfg)` surface of the target design (SURVEY.md §3.3).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from . import diagnostics
from .advi import fit_advi
from .configs import RunConfig
from .hmc import run_hmc
from .metric import make_metric_fn
from .nuts import run_nuts
from .potential import (
    constrain,
    make_potential,
    make_potential_and_grad,
    sample_prior,
)
from .rhmc import run_rhmc
from .smc import run_smc


# Cost-aware dispatch threshold for the fused Riemannian kernels (VERDICT
# round-3 item 4 / Weak #3): the Mosaic compile of the implicit-trajectory
# kernels is expensive (tens of seconds warm-cache restore, minutes cold
# through the axon tunnel), and the per-step advantage (~6x) only amortizes
# it at production chain counts.  Measured on cfg1 (64 chains, full metric):
# XLA 96 s warm end-to-end vs fused 155 s warm / 599 s cold — the fused
# path LOSES below a few hundred chains.  "auto" therefore requires
# n_chains >= this threshold before taking the fused Riemannian kernels;
# kernel="pallas" overrides (e.g. for benchmarks / long runs where the
# per-step win dominates).
RHMC_PALLAS_MIN_CHAINS = 256


def _select_kernel(pref: str, feasible: bool, auto_ok: bool = True) -> bool:
    """Resolve the RunConfig.kernel preference against shape feasibility
    and the cost model: returns whether to take the fused Pallas path."""
    if pref not in ("auto", "pallas", "xla"):
        raise ValueError(f"kernel must be 'auto'|'pallas'|'xla', got {pref!r}")
    if pref == "xla" or jax.default_backend() != "tpu":
        return False
    if pref == "pallas":
        return feasible
    return feasible and auto_ok


@dataclass
class SampleOutput:
    config: RunConfig
    thetas: np.ndarray          # (C, N, K, 3) draws (or (P, 1, K, 3) for SMC/ADVI)
    masks: np.ndarray           # (K,) or per-particle (P, K)
    stats: dict[str, Any] = field(default_factory=dict)


def sample(cfg: RunConfig, seed: int = 0, image=None, mesh=None,
           metrics_path: str | None = None,
           checkpoint_path: str | None = None, resume: bool = False) -> SampleOutput:
    """Run the configured head on the config's mock scene (or a given image).

    metrics_path: optional JSONL sink for run metrics (SURVEY.md §5.5).
    checkpoint_path/resume: orbax block checkpoints for the MCMC heads; with
    resume=True a crashed run continues from its last completed block and
    the output contains only the remaining draws (SURVEY.md §5.3/§5.4)."""
    truth_theta, mock_img = cfg.make_data()
    img = mock_img if image is None else jnp.asarray(image)
    spec, prior = cfg.scene, cfg.prior
    mask = jnp.ones(cfg.kmax)
    key = jax.random.key(seed)

    pg = make_potential_and_grad(spec, img, prior)
    grad_fn = lambda th: pg(th, mask)

    # long runs sample in 250-draw jit blocks (driver.sample_blocked):
    # bitwise-identical and robust for long device programs
    block = 250 if cfg.n_samples > 300 else None
    if checkpoint_path is not None and block is None:
        block = max(1, cfg.n_samples // 4)  # checkpointing implies blocks
    logger = None
    if metrics_path is not None:
        from .metrics import MetricsLogger

        logger = MetricsLogger(metrics_path, cfg.name)
    ck = dict(checkpoint_path=checkpoint_path, resume=resume, logger=logger)
    if cfg.head in ("hmc", "oracle", "nuts", "rhmc"):
        ck["thin"] = cfg.thin  # record every thin-th transition

    t_start = time.perf_counter()
    stats: dict[str, Any] = {}

    # Chain-axis sharding is uniform across the MCMC heads: shard theta0
    # over the mesh and GSPMD partitions the vmapped kernels, turning the
    # pooled-warmup reductions into psums (SURVEY.md §5.8).  The fused
    # Pallas HMC kernel additionally runs per-shard under shard_map
    # (pallas_call has no GSPMD rule); the pure-XLA heads need nothing else.
    theta0 = None
    if cfg.head in ("hmc", "oracle", "nuts", "rhmc", "chees"):
        theta0 = _init_chains(key, cfg, truth_theta)
        if mesh is not None:
            from .dist import shard_chains

            theta0 = shard_chains(theta0, mesh, mesh.axis_names[0])

    if cfg.head in ("hmc", "oracle"):
        # Kernel dispatch: small scenes take the fused VPU trajectory
        # kernel (~3x XLA); crowded fields take the fused MXU kernel
        # (parity with XLA at the cfg4 shape — both exp-bound, see
        # docs/DESIGN.md roofline; kept as the VMEM-resident path);
        # anything else stays on XLA
        from .pallas_kernels import fused_supported
        from .pallas_mxu import mxu_fused_supported

        vpu_ok = fused_supported(spec, cfg.kmax, cfg.n_chains)
        mxu_ok = mxu_fused_supported(spec, cfg.kmax, cfg.n_chains)
        # plain-leapfrog kernels win at every measured chain count (no
        # implicit solver, small compile) — auto takes them when feasible
        if _select_kernel(cfg.kernel, vpu_ok or mxu_ok):
            from .hmc import run_hmc_pallas

            stats["kernel"] = "pallas_fused_vpu" if vpu_ok else "pallas_fused_mxu"
            res, wr = run_hmc_pallas(
                jax.random.fold_in(key, 1), spec, img, prior, theta0, mask,
                cfg.n_samples, cfg.n_warmup, cfg.hmc, block_size=block,
                mesh=mesh, **ck,
            )
        else:
            stats["kernel"] = "xla"
            res, wr = run_hmc(
                jax.random.fold_in(key, 1), grad_fn, theta0, mask,
                cfg.n_samples, cfg.n_warmup, cfg.hmc, block_size=block, **ck,
            )
        thetas = np.asarray(res.thetas)
        stats.update(step_size=float(wr.step_size),
                     accept=float(np.asarray(res.accept_prob).mean()),
                     divergences=int(np.asarray(res.diverged).sum()))
        masks = np.asarray(mask)
    elif cfg.head == "nuts":
        res, wr = run_nuts(
            jax.random.fold_in(key, 1), grad_fn, theta0, mask,
            cfg.n_samples, cfg.n_warmup, cfg.nuts, block_size=block, **ck,
        )
        thetas = np.asarray(res.thetas)
        stats.update(step_size=float(wr.step_size),
                     accept=float(np.asarray(res.accept_prob).mean()),
                     divergences=int(np.asarray(res.diverged).sum()))
        masks = np.asarray(mask)
    elif cfg.head == "rhmc":
        pfn = make_potential(spec, img, prior)
        if cfg.rhmc.metric not in ("full", "diag"):
            raise ValueError(
                f"rhmc.metric must be 'full' or 'diag', got {cfg.rhmc.metric!r}"
            )
        if cfg.rhmc.metric == "diag":
            from .metric import make_diag_metric_fn

            metric = make_diag_metric_fn(spec, prior)
        else:
            metric = make_metric_fn(spec, prior)
        # Kernel dispatch (mirrors the hmc head): the fused Riemannian
        # trajectory kernels — pallas_rhmc (full metric, ~6x XLA) and
        # pallas_rhmc_diag (diagonal metric, 6.5x XLA lanes / MXU layout
        # for crowded fields) — when the shape supports them AND the cost
        # model favors them (auto requires RHMC_PALLAS_MIN_CHAINS; the
        # fused kernels' Mosaic compile dwarfs small runs — VERDICT r3 #4).
        from .pallas_rhmc_diag import diag_fused_supported, diag_mxu_supported

        if cfg.rhmc.metric == "diag":
            # The VPU (chains-on-lanes) layout needs a >=64-wide full lane
            # tile (diag_fused_supported enforces it); other chain counts
            # use the chains-on-sublanes MXU layout when its working set
            # fits VMEM.  The same gates drive make_pallas_rhmc_kernel's
            # builder choice (rhmc.py), so kern_name matches what runs.
            vpu_diag = diag_fused_supported(spec, cfg.kmax, cfg.n_chains)
            pallas_ok = vpu_diag or diag_mxu_supported(spec, cfg.kmax,
                                                       cfg.n_chains)
            kern_name = ("pallas_rhmc_diag_vpu" if vpu_diag
                         else "pallas_rhmc_diag_mxu")
        else:
            # same scene/kmax bounds as fused_supported, but the chain
            # granularity is 64, not 128: the Riemannian kernel's tile
            # auto-shrinks to gcd(C, 128) and a 64-wide tile is a full
            # lane block that compiles and runs (measured round 3)
            pallas_ok = (spec.height * spec.width <= 48 * 48
                         and cfg.kmax <= 16 and cfg.n_chains % 64 == 0)
            kern_name = "pallas_rhmc"
        if _select_kernel(cfg.kernel, pallas_ok,
                          auto_ok=cfg.n_chains >= RHMC_PALLAS_MIN_CHAINS):
            from .rhmc import run_rhmc_pallas

            stats["kernel"] = kern_name
            res, wr = run_rhmc_pallas(
                jax.random.fold_in(key, 1), spec, img, prior, theta0, mask,
                cfg.n_samples, cfg.n_warmup, cfg.rhmc, block_size=block,
                mesh=mesh, **ck,
            )
        else:
            stats["kernel"] = "xla"
            # the XLA Riemannian body in a >=250-step scan crashes this
            # VM's axon worker at >=256 chains (round 4; 100-step programs
            # measured safe) — capped by runtime.max_program_steps, one
            # knob shared with warmup/SMC (VERDICT round-4 item 6); the
            # extra ~20 ms dispatch per block is negligible
            from .runtime import max_program_steps

            blk = block
            if max_program_steps() is not None:
                blk = min(block or cfg.n_samples, max_program_steps())
            res, wr = run_rhmc(
                jax.random.fold_in(key, 1), pfn, metric, grad_fn, theta0,
                mask, cfg.n_samples, cfg.n_warmup, cfg.rhmc,
                block_size=blk, **ck,
            )
        thetas = np.asarray(res.thetas)
        stats.update(step_size=float(wr.step_size),
                     accept=float(np.asarray(res.accept_prob).mean()),
                     divergences=int(np.asarray(res.diverged).sum()))
        if res.solver_fail is not None:
            # fixed-point solver force-rejections, separate from Delta-H
            # divergences (VERDICT round-3 item 5)
            stats["solver_rejections"] = int(np.asarray(res.solver_fail).sum())
        masks = np.asarray(mask)
    elif cfg.head == "chees":
        from .chees import (ChEESConfig, make_chees_relocate,
                            make_fused_leapfrog_impl, run_chees)
        from .pallas_kernels import fused_supported

        impl = None
        if _select_kernel(cfg.kernel,
                          fused_supported(spec, cfg.kmax, cfg.n_chains)):
            # runtime-trip-count fused trajectory kernel: the adapted
            # n_steps is an SMEM scalar, so ChEES stays on the fast path
            impl = make_fused_leapfrog_impl(spec, img, prior, cfg.kmax)
            stats["kernel"] = "pallas_fused_dyn"
        else:
            stats["kernel"] = "xla"
        # configuration-hop relocation (round 5): the scene is known here,
        # so the metastability cure is on by default (chees.relocate_every)
        reloc = (make_chees_relocate(spec, img, prior)
                 if cfg.chees.relocate_every > 0 else None)
        res, ad = run_chees(
            jax.random.fold_in(key, 1), grad_fn, theta0, mask,
            cfg.n_samples, cfg.n_warmup, cfg.chees, leapfrog_impl=impl,
            block_size=block, relocate_fn=reloc, **ck,
        )
        thetas = np.asarray(res.thetas)
        stats.update(step_size=float(ad["step_size"]),
                     traj_length=float(ad["traj_length"]),
                     accept=float(np.asarray(res.accept_prob).mean()),
                     divergences=int(np.asarray(res.diverged).sum()),
                     warmup_divergences=int(ad["warmup_divergences"]))
        if "traj_converged" in ad:
            # adapted-T sanity band (VERDICT round-4 item 1c): drift of the
            # log-T ascent over the last two warmup windows; a resumed run
            # restores T from its checkpoint and has no drift to report
            stats.update(traj_drift=ad["traj_drift"],
                         traj_converged=ad["traj_converged"],
                         warmup_extensions=ad["warmup_extensions"],
                         t_probe_factor=ad.get("t_probe_factor", 1.0),
                         eq_stages=ad.get("eq_stages", 0),
                         eq_disagreement=ad.get("eq_disagreement"))
        masks = np.asarray(mask)
    elif cfg.head == "transdim":
        from .pallas_kernels import fused_supported
        from .transdim_mcmc import run_transdim

        tdm = cfg.tdm
        # Fused-kernel dispatch mirrors the HMC head: on a TPU with a small
        # scene and lane-aligned chain count, the within-model move rides
        # the per-chain-mask Pallas kernels (hmc_pallas / rhmc_pallas).
        # Under a mesh the XLA mutations are used (GSPMD partitions them
        # from the sharded TDState; the pallas kernels have no GSPMD rule).
        if (mesh is None
                and _select_kernel(cfg.kernel,
                                   fused_supported(spec, cfg.kmax, cfg.n_chains))
                and tdm.mutation in ("hmc", "rhmc", "rhmc_diag")):
            tdm = tdm._replace(mutation=tdm.mutation + "_pallas")
        stats["kernel"] = tdm.mutation
        res, eps = run_transdim(
            jax.random.fold_in(key, 1), spec, img, prior, cfg.kmax,
            cfg.n_chains, cfg.n_samples, cfg.n_warmup, tdm,
            block_size=block, mesh=mesh, **ck,
        )
        thetas = np.asarray(res.thetas)
        masks = np.asarray(res.masks)  # (C, N, K) per-draw alive masks
        stats.update(step_size=float(eps),
                     accept=float(np.asarray(res.accept_prob).mean()),
                     td_accept=float(np.asarray(res.td_accept).mean()),
                     divergences=int(np.asarray(res.diverged).sum()),
                     solver_rejections=int(np.asarray(res.solver_fail).sum()))
    elif cfg.head == "smc":
        res = run_smc(
            jax.random.fold_in(key, 1), spec, img, prior, cfg.kmax, cfg.smc,
            mesh=mesh, **ck,
        )
        thetas = np.asarray(res.theta)[:, None, :, :]
        masks = np.asarray(res.mask)
        stats.update(log_z=float(res.log_z), n_temp_steps=int(res.n_steps),
                     accept=float(res.mean_accept), step_size=float(res.eps),
                     beta=float(res.beta))
        if res.final_done is not None:
            # posterior rounds actually run (plateau-stopped when
            # smc.plateau_window > 0 — VERDICT round-3 item 1)
            stats["final_rounds"] = int(res.final_done)
        if res.island_diag is not None:
            # between-island convergence gate (VERDICT round-4 item 2):
            # islands are independent ancestries, so their R̂ measures true
            # population spread where pooled split-R̂ understates it
            stats.update(res.island_diag)
        if float(res.beta) < 1.0:
            stats["warning"] = (
                f"tempering capped at beta={float(res.beta):.4f} "
                f"(max_steps={cfg.smc.max_steps}); raise smc.max_steps"
            )
    elif cfg.head == "advi":
        # ADVI intentionally skips mesh/checkpoint/blocked sampling: the
        # fit is a seconds-scale deterministic optax loop on one chip (no
        # long-run durability surface to protect), and its "draws" are
        # 1000 iid samples from q in the SMC-style (P, 1, K, 3) layout
        # (summarize_output moves particles onto the draw axis).  The
        # logger still gets per-window ELBO records (SURVEY.md §5.5).
        mu0 = sample_prior(jax.random.fold_in(key, 2), cfg.kmax, prior)
        if cfg.advi.full_rank:
            from .advi import advi_sample_fullrank, fit_advi_fullrank

            res = fit_advi_fullrank(jax.random.fold_in(key, 1), grad_fn,
                                    mu0, cfg.advi)
            draws = advi_sample_fullrank(jax.random.fold_in(key, 3), res, 1000)
            stats["family"] = "full_rank"
        else:
            from .advi import advi_sample

            res = fit_advi(jax.random.fold_in(key, 1), grad_fn, mu0, mask,
                           cfg.advi)
            draws = advi_sample(jax.random.fold_in(key, 3), res, mask, 1000)
            stats["family"] = "mean_field"
        thetas = np.asarray(draws)[:, None, :, :]
        masks = np.asarray(mask)
        stats.update(elbo=float(np.asarray(res.elbo_trace)[-50:].mean()))
        if logger is not None:
            tr = np.asarray(res.elbo_trace)
            n_win = 5
            for i in range(n_win):
                lo, hi = i * len(tr) // n_win, (i + 1) * len(tr) // n_win
                if lo < hi:
                    logger.log("advi_window", window=i, step_lo=lo,
                               step_hi=hi, elbo=float(tr[lo:hi].mean()))
    else:
        raise ValueError(f"unknown head {cfg.head!r}")

    jax.block_until_ready(jnp.zeros(()))
    stats["wall_seconds"] = time.perf_counter() - t_start
    if logger is not None:
        logger.log("run_complete", head=cfg.head,
                   **{k: v for k, v in stats.items() if isinstance(v, (int, float))})
        logger.close()
    stats["truth"] = {
        k: np.asarray(v)
        for k, v in zip("xyf", constrain(truth_theta, spec))
    }
    return SampleOutput(cfg, thetas, masks, stats)


def _init_chains(key: jax.Array, cfg: RunConfig, truth_theta: jax.Array) -> jax.Array:
    """Chains initialized near the truth with small jitter (mock-data runs)."""
    jit = 0.01 * jax.random.normal(
        jax.random.fold_in(key, 7), (cfg.n_chains,) + truth_theta.shape
    )
    return truth_theta[None] + jit


def summarize_output(out: SampleOutput) -> dict[str, Any]:
    """Permutation-safe posterior summaries (SURVEY.md ⑱): total flux,
    per-slot moments for fixed-K runs, and the star-count posterior
    (mode / mean / histogram) for trans-dimensional runs."""
    th = out.thetas  # (C, N, K, 3)
    mask = out.masks
    if mask.ndim == 1:
        alive = mask[None, None, :]
    elif mask.ndim == 2:  # per-particle (SMC)
        alive = mask[:, None, :]
    else:                 # per-draw (trans-d MCMC): (C, N, K)
        alive = mask
    def _series(a: np.ndarray) -> np.ndarray:
        # SMC/ADVI outputs are (P, 1): put particles on the draw axis so
        # sd/MCSE are computed across particles instead of degenerating
        return a.T if (a.shape[1] == 1 and a.shape[0] > 1) else a

    tot_flux = _series((np.exp(th[..., 2]) * alive).sum(-1))  # (C, N)
    summ = {"total_flux": diagnostics.summarize(tot_flux)}
    if mask.ndim >= 2:  # trans-dimensional: star-count posterior over n
        counts = alive.sum(-1).reshape(-1).astype(int)  # particles or draws
        kmax = th.shape[2]
        hist = np.bincount(counts, minlength=kmax + 1)[: kmax + 1]
        pn = hist / max(counts.size, 1)
        summ["star_count"] = {
            "mode": int(np.argmax(hist)),
            "mean": float(counts.mean()),
            "sd": float(counts.std()),
            "pmf": {str(i): round(float(p), 4) for i, p in enumerate(pn) if p > 0},
        }
    if mask.ndim == 1 and th.shape[2] == 1:
        w = out.config.scene.width
        h = out.config.scene.height
        summ["x"] = diagnostics.summarize(_series(w / (1 + np.exp(-th[:, :, 0, 0]))))
        summ["y"] = diagnostics.summarize(_series(h / (1 + np.exp(-th[:, :, 0, 1]))))
        summ["flux"] = diagnostics.summarize(_series(np.exp(th[:, :, 0, 2])))
    return summ
