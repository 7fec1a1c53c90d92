"""Shape-qualification preflight — mechanized accelerator-vs-CPU count parity.

The axon TPU backend has a GRID-SHAPE-DEPENDENT miscompile family (sixth
ledger member, BASELINE.md round-4): the (60,220,128) inert-padded flagship
STALLS Newton in-step on axon (16 Newton at the KSP cap) while the same
case at the same scale and dtype converges on CPU in 4 Newton / 5 FGMRES —
and (60,220,85) is exact on both.  CLAUDE.md therefore prescribes, in
prose, validating ANY new grid shape at scale against CPU counts before
trusting it.  This module mechanizes that check (VERDICT r4 next-#3):

- :func:`qualify_steps` runs a short deterministic Δt ramp (doubling on
  success, halving on failure) through ``Simulator.step`` and records
  per-step Newton/FGMRES counts, convergence, and scaled norms — one
  ``jax.device_get`` per step (CLAUDE.md measurement discipline).
- :func:`compare_runs` compares an accelerator run against the CPU
  reference.  CPU reproduces TPU counts EXACTLY on sane programs
  (verified 97 == 97 at full-SPE10 scale, BASELINE.md round 3), and the
  ledgered failures are gross (stall at the iteration cap), so the
  thresholds are loose: convergence flags must match, Newton within ±2,
  FGMRES within max(5, 50%).
- :func:`qualify_case` orchestrates both: the current default backend
  in-process, the CPU reference in a subprocess (the platform is pinned
  at jax init, so one process cannot honestly run both), and the verdict.

CLI (used by tools/qualify_shape.py and ``run_case.py --qualify``):

    python -m thermalporous_tpu.qualify --case tp_spe10_full
    python -m thermalporous_tpu.qualify --case tp_spe10_padded --nz 128
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def qualify_steps(case, steps: int = 4, dt0: float | None = None,
                  dtype=None) -> list[dict]:
    """Run ``steps`` warmed Newton steps on the current default backend.

    Δt policy is deterministic (double on success, halve on failure) so
    two backends produce comparable per-step records unless the numerics
    themselves diverge — which is exactly what is being detected.
    """
    import jax
    import jax.numpy as jnp

    from thermalporous_tpu.precond import cpr
    from thermalporous_tpu.solve import Simulator

    dtype = dtype or jnp.float32
    model, data = case.model, case.data
    data = jax.tree.map(
        lambda a: a.astype(dtype) if hasattr(a, "astype") else a, data)
    # the qualification's whole job is MEASURING shapes/configs the
    # static ledger guard refuses (e.g. the KNOWN_BAD_SHAPES repros) —
    # bypass the guard for the step construction only, then restore
    orig_backend = cpr._backend
    cpr._backend = lambda: f"qualify[{jax.default_backend()}]"
    try:
        sim = Simulator(model, data, precond=case.precond,
                        newton_cfg=case.newton_cfg, pc_cfg=case.pc_cfg)
    finally:
        cpr._backend = orig_backend
    u = model.initial_state(data, dtype=dtype)
    # start BELOW dt_init: the ledgered stall reproduces at the easiest
    # (smallest-Δt) step, so the ramp must include one
    dt = dt0 if dt0 is not None else case.time_cfg.dt_init / 2.0
    records = []
    for _ in range(steps):
        u_new, st = sim.step(u, dt)
        s = jax.device_get(st)          # ONE fetch per step
        rec = dict(dt=float(dt), newton=int(s.iters), ksp=int(s.ksp_iters),
                   converged=bool(s.converged), norm0=float(s.norm0),
                   norm=float(s.norm))
        records.append(rec)
        if rec["converged"]:
            u, dt = u_new, dt * 2.0
        else:
            dt = dt * 0.5
    return records


def compare_runs(acc: list[dict], ref: list[dict]) -> tuple[bool, list[str]]:
    """Loose count-parity verdict (see module docstring for thresholds)."""
    msgs = []
    ok = True
    for i, (a, r) in enumerate(zip(acc, ref)):
        tag = f"step {i} (dt={r['dt']:.0f}s)"
        if a["dt"] != r["dt"]:
            ok = False
            msgs.append(f"{tag}: Δt trajectories diverged "
                        f"(acc {a['dt']:.0f} vs cpu {r['dt']:.0f})")
            break
        if a["converged"] != r["converged"]:
            ok = False
            msgs.append(
                f"{tag}: convergence mismatch — accelerator "
                f"{'converged' if a['converged'] else 'STALLED'} "
                f"(N={a['newton']}, ksp={a['ksp']}, norm {a['norm']:.2e}) "
                f"vs CPU {'converged' if r['converged'] else 'stalled'} "
                f"(N={r['newton']}, ksp={r['ksp']})")
            continue
        if abs(a["newton"] - r["newton"]) > 2:
            ok = False
            msgs.append(f"{tag}: Newton counts {a['newton']} vs CPU "
                        f"{r['newton']} (>±2)")
        if abs(a["ksp"] - r["ksp"]) > max(5, 0.5 * r["ksp"]):
            ok = False
            msgs.append(f"{tag}: FGMRES counts {a['ksp']} vs CPU "
                        f"{r['ksp']} (>max(5, 50%))")
    return ok, msgs


def _build_case(case_name: str, nz: int | None):
    from thermalporous_tpu.presets import get_case

    kwargs = {}
    if nz is not None:
        kwargs["nz_pad"] = nz
    return get_case(case_name, **kwargs)


def qualify_case(case_name: str, steps: int = 4, dt0: float | None = None,
                 nz: int | None = None, verbose: bool = True) -> bool:
    """Run the preflight: current backend in-process vs a CPU subprocess.

    Returns True iff the shape qualifies.  Prints the verdict unless
    ``verbose=False``.
    """
    import jax

    backend = jax.default_backend()
    case = _build_case(case_name, nz)
    if verbose:
        print(f"# qualify {case.name}: grid {case.model.grid.shape} on "
              f"'{backend}' vs CPU reference ({steps} steps)", flush=True)
    acc = qualify_steps(case, steps=steps, dt0=dt0)
    if verbose:
        for r in acc:
            print(f"#   [{backend}] dt={r['dt']:8.0f}s newton={r['newton']:3d} "
                  f"ksp={r['ksp']:4d} converged={r['converged']} "
                  f"norm={r['norm']:.2e}", flush=True)
    if backend == "cpu":
        print("# default backend IS cpu — nothing to cross-check; the "
              "qualification compares an accelerator against the CPU "
              "reference.  PASS (trivially).")
        return True
    # CPU reference in a subprocess: the jax platform is pinned per
    # process, and probing a second backend in-process is the exact trap
    # CLAUDE.md documents.  PYTHONPATH is inherited (keeps /root/.axon_site).
    cmd = [sys.executable, "-m", "thermalporous_tpu.qualify",
           "--case", case_name, "--platform", "cpu", "--json",
           "--steps", str(steps)]
    if dt0 is not None:
        cmd += ["--dt0", str(dt0)]
    if nz is not None:
        cmd += ["--nz", str(nz)]
    out = subprocess.run(cmd, capture_output=True, text=True,
                         env=os.environ.copy(), timeout=7200)
    if out.returncode != 0:
        raise RuntimeError(
            f"CPU reference run failed (rc={out.returncode}):\n"
            f"{out.stderr[-2000:]}")
    ref = json.loads(out.stdout.strip().splitlines()[-1])["records"]
    if verbose:
        for r in ref:
            print(f"#   [cpu] dt={r['dt']:8.0f}s newton={r['newton']:3d} "
                  f"ksp={r['ksp']:4d} converged={r['converged']} "
                  f"norm={r['norm']:.2e}", flush=True)
    ok, msgs = compare_runs(acc, ref)
    if verbose:
        for m in msgs:
            print(f"# MISMATCH {m}")
        print(f"# verdict: {'PASS' if ok else 'FAIL'} — "
              + ("counts match the CPU reference" if ok else
                 "suspect a grid-shape-dependent backend miscompile "
                 "(CLAUDE.md sixth family; BASELINE.md round-4 ledger)"))
    return ok


def _main(argv):
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--case", default="tp_spe10_full")
    p.add_argument("--nz", type=int, default=None,
                   help="tp_spe10_padded nz_pad override")
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--dt0", type=float, default=None)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--json", action="store_true",
                   help="emit one JSON line of records (no comparison)")
    args = p.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    if args.json:
        case = _build_case(args.case, args.nz)
        recs = qualify_steps(case, steps=args.steps, dt0=args.dt0)
        print(json.dumps({"case": case.name,
                          "platform": jax.default_backend(),
                          "records": recs}))
        return 0
    ok = qualify_case(args.case, steps=args.steps, dt0=args.dt0, nz=args.nz)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(_main(sys.argv[1:]))
