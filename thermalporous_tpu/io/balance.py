"""End-of-run material/energy balance audit.

The classic reservoir-engineering closure report: change of in-place
conserved quantities (fluid mass per phase, thermal energy) vs the
cumulative well/heater throughput.  For this backward-Euler TPFA
discretization the two agree EXACTLY up to the Newton convergence
tolerance — summing the residual over all cells telescopes the interior
fluxes (no-flow boundaries, SURVEY.md §2.2), leaving

    M(u_n) − M(u_{n−1}) = Δt_n · Q(u_n) + Δt_n · Σ_cells R(u_n),

so the reported relative error is a direct measure of solver-tolerance-
induced drift.  The reference has no such report (print-based monitoring
only — SURVEY.md §5.5); every production reservoir simulator prints one.

Usage::

    aud = BalanceAuditor(model, data, u0)
    sim.run(t_end, u0=u0, callback=aud)
    print(format_balance(aud.report()))

Composable with other callbacks (metrics/VTK/checkpoint) — the CLI's
``--balance`` flag wires it in (examples/run_case.py).
"""

from __future__ import annotations

import jax
import numpy as np


class BalanceAuditor:
    """``Simulator.run`` callback accumulating the balance audit.

    Works on BOTH loop flavors: host-loop records evaluate Δt·Q(uₙ) here
    from the materialized state, while blocked-mode records
    (``TimeConfig.block_steps>1``) carry the per-step source integral
    computed IN-DEVICE by the block body (``StepRecord.src_dt`` /
    ``BlockStats.src_dt``) — the intermediate states themselves are never
    materialized, so the in-place totals refresh only at state-consistent
    (block-final) records, which is all the telescoped closure needs.
    Records with neither a state nor a source integral (none are produced
    today) are counted and flag the report incomplete rather than
    silently wrong.
    """

    def __init__(self, model, data, u0):
        self.labels = tuple(
            getattr(model, "eq_labels", tuple(f"eq{i}" for i in range(model.nc)))
        )
        self._model = model
        self.set_data(data)
        # ONE bulk transfer per call — under the axon tunnel every host
        # scalar fetch is a ~30 ms round trip (CLAUDE.md measurement notes)
        m0, _ = jax.device_get(self._fn(u0))
        self.m0 = np.asarray(m0, dtype=np.float64)
        self.m_last = self.m0
        self.cum = np.zeros_like(self.m0)
        self.cum_abs = np.zeros_like(self.m0)
        self.steps = 0
        self.skipped = 0

    def set_data(self, data):
        """Rebind the problem data (``Simulator.run_schedule`` calls this at
        every control-segment boundary so the source integral uses the
        ACTIVE well/heater fields)."""
        model = self._model
        self._fn = jax.jit(
            lambda u: (model.in_place_totals(u, data), model.source_totals(u, data))
        )

    def __call__(self, step, t, u, rec):
        src = getattr(rec, "src_dt", None)
        consistent = getattr(rec, "state_consistent", True)
        if src is not None:
            # blocked mode: Δtₙ·Q(uₙ) was integrated in-device (Δt > 0, so
            # |∫| per step equals Δt·|Q| — the same cum_abs as below)
            src = np.asarray(src, dtype=np.float64)
            self.cum += src
            self.cum_abs += np.abs(src)
            if consistent:
                m, _ = jax.device_get(self._fn(u))
                self.m_last = np.asarray(m, dtype=np.float64)
            self.steps += 1
            return
        if not consistent:
            self.skipped += 1
            return
        m, q = jax.device_get(self._fn(u))
        self.m_last = np.asarray(m, dtype=np.float64)
        q = np.asarray(q, dtype=np.float64)
        # implicit Euler: sources integrate as Δt × rate at the NEW state
        self.cum += rec.dt * q
        self.cum_abs += rec.dt * np.abs(q)
        self.steps += 1

    def report(self) -> dict:
        """Per-equation-row closure: Δ(in place) vs ∫ sources dt.

        ``rel_error`` is normalized by max(|Δ in place|, cumulative
        absolute throughput) so balanced injection/production (Δ ≈ 0 with
        large through-flow) stays well-conditioned.
        """
        delta = self.m_last - self.m0
        err = delta - self.cum
        denom = np.maximum(np.maximum(np.abs(delta), self.cum_abs), 1e-300)
        rows = {}
        for i, lab in enumerate(self.labels):
            rows[lab] = {
                "delta_in_place": float(delta[i]),
                "cum_source": float(self.cum[i]),
                "abs_error": float(err[i]),
                "rel_error": float(abs(err[i]) / denom[i]),
            }
        return {
            "steps": self.steps,
            "complete": self.skipped == 0,
            "skipped_records": self.skipped,
            "rows": rows,
        }


def format_balance(report: dict) -> str:
    """Human-readable closure table (the CLI's end-of-run print)."""
    lines = ["# material/energy balance audit "
             f"({report['steps']} steps"
             + ("" if report["complete"]
                else f"; INCOMPLETE — {report['skipped_records']} blocked-"
                     "mode records skipped") + ")"]
    lines.append(f"#   {'row':10s} {'Δ in-place':>14s} {'∫ sources dt':>14s} "
                 f"{'error':>11s} {'rel':>9s}")
    for lab, r in report["rows"].items():
        lines.append(
            f"#   {lab:10s} {r['delta_in_place']:+14.6e} "
            f"{r['cum_source']:+14.6e} {r['abs_error']:+11.3e} "
            f"{r['rel_error']:9.2e}"
        )
    return "\n".join(lines)
