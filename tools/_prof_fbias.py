"""Force-bias POWER probe at a hot (contracted-core) state — the fast
bisect for secular energy drift.

The kilostep gate integrates 1024 steps (~18 min/run on the tunnelled
chip); this probe instead measures, at a checkpointed hot state, the
power the production force approximation injects into the system:

    P_err = sum_i m_i v_i . (a_prod,i - a_direct,i)

dE/dt of the integrated system due to force error ~ P_err, so
P_err * dt * 128 / |E| directly predicts the per-128-step drift slope
the gate would see — one number per config variant, ~6 s of direct
O(N^2) reference (1e12 pairs ride the same VPU panels as the bench) and
one band build each, instead of a kilostep per variant.  Also reports
the MAX_SPEED clamp's KE removal rate (the only intentionally
dissipative term, nbody_v5.cu:262-269) and per-band overflow flags.

Usage:
  NBODY_HOT_STATE=/tmp/hot1m_r5c.npz python tools/_prof_fbias.py \
      "" "force_tile=256" "near_cap=2048,mid_cap=640"
Each positional arg is a KS_OVER-style override string applied to the
v5_bench preset ("" = the shipping structure).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.config import SimConfig, PRESETS
from nbody_tpu.ops import forces
from nbody_tpu.models.simulation import sort_by_morton
from nbody_tpu.utils.io import load_checkpoint
from nbody_tpu.utils import metrics
from nbody_tpu.utils.profiling import _sync

hot = os.environ.get("NBODY_HOT_STATE", "/tmp/hot1m_r5c.npz")
if hot == "IC":
    from nbody_tpu.init import make_initial_state

    st = make_initial_state(PRESETS["v5_bench"].replace(
        n=int(os.environ.get("NBODY_N", "1000000"))))
    at_step = 0
else:
    st, at_step = load_checkpoint(hot)
st = jax.device_put(st)
_sync(st)
n = st.pos.shape[0]
print(f"hot state {hot} (step {at_step}), n={n}", flush=True)

variants = sys.argv[1:] or [""]


def parse(ov):
    out = {}
    for kv in filter(None, ov.split(",")):
        k_, v_ = kv.split("=")
        f_ = SimConfig.__dataclass_fields__[k_].type
        out[k_] = (v_.lower() in ("1", "true")) if "bool" in str(f_) else (
            float(v_) if "float" in str(f_) else int(v_))
    return out


base = PRESETS["v5_bench"].replace(n=n, check_overflow=False)

# direct O(N^2) reference acceleration (fp32, blocked panels)
t0 = time.perf_counter()
a_true = jax.jit(lambda p, m: forces.direct_forces(p, m, base))(
    st.pos, st.mass
)
a_true.block_until_ready()
_sync(st)
print(f"direct O(N^2) reference: {time.perf_counter()-t0:.1f}s "
      f"(incl compile)", flush=True)

e_tot = float(metrics.total_energy(st, base))
print(f"E = {e_tot:.6e}", flush=True)

for ov in variants:
    cfg = base.replace(**parse(ov))

    def probe(pos, vel, mass, a_ref):
        codes_s, perm, _, _ = sort_by_morton(pos, cfg)
        ps, ms, cs = forces.pad_sorted(pos[perm], mass[perm], codes_s,
                                       cfg.force_tile)
        cells, ss, bands, tables = forces.build_bands(ps, ms, cs, cfg)
        a_prod = forces.apply_bands(ps, ms, ss, bands, tables, cfg)
        npad = ps.shape[0]
        vs = jnp.pad(vel[perm], ((0, npad - n), (0, 0)))
        ar = jnp.pad(a_ref[perm], ((0, npad - n), (0, 0)))
        da = a_prod - ar
        # power injected by the approximation error (dE/dt ~ P_err)
        p_err = jnp.sum(ms[:, None] * vs * da)
        # error magnitude stats
        nrm = jnp.linalg.norm(da, axis=1)
        den = jnp.linalg.norm(ar, axis=1) + 1e-6
        rel = nrm / den
        # core/halo split by |a_true| (the contracted core has the
        # biggest accelerations): is the error concentrated there, and
        # does the core carry the whole systematic power?
        qa = jnp.percentile(den[:n], 90.0)
        core = (den >= qa) & (jnp.arange(den.shape[0]) < n)
        p_core = jnp.sum(jnp.where(core, ms * jnp.sum(vs * da, axis=1), 0.0))
        rel_core = jnp.sum(jnp.where(core, rel, 0.0)) / jnp.sum(core)
        rel_halo = (jnp.sum(jnp.where(core, 0.0, rel)[:n])
                    / (n - jnp.sum(core)))
        q50, q90, q99 = jnp.percentile(rel[:n], jnp.float32([50., 90., 99.]))
        # MAX_SPEED clamp KE removal over one step with the production
        # accel (the v5-parity clamp is intentionally dissipative)
        v1 = vs + a_prod * cfg.dt
        sp = jnp.linalg.norm(v1, axis=1)
        over = sp > cfg.max_speed
        ke_loss = 0.5 * jnp.sum(
            jnp.where(over, ms * (sp**2 - cfg.max_speed**2), 0.0)
        )
        ovf = jnp.stack([
            bands.ss_overflow, bands.sup_overflow, bands.mid_overflow,
            bands.cmid_overflow, bands.near_overflow, cells.overflow,
            cells.overflow_g2,
        ])
        return (p_err, jnp.mean(rel[:n]), jnp.max(rel[:n]),
                jnp.sum(over.astype(jnp.int32)), ke_loss, ovf,
                cells.n_cells, p_core, rel_core, rel_halo, q50, q90, q99)

    t0 = time.perf_counter()
    out = jax.jit(probe)(st.pos, st.vel, st.mass, a_true)
    (p_err, rel_mean, rel_max, n_clamp, ke_loss, ovf, n_cells,
     p_core, rel_core, rel_halo, q50, q90, q99) = map(
        np.asarray, jax.device_get(out)
    )
    _sync(st)
    dt_c = time.perf_counter() - t0
    de_128 = float(p_err) * cfg.dt * 128.0
    print(
        f"[{ov or 'ship'}] P_err={float(p_err):+.4e} "
        f"dE/128steps={de_128:+.4e} (drift/128={de_128/abs(e_tot):+.2e}) "
        f"rel_mean={float(rel_mean):.2e} rel_max={float(rel_max):.2e} "
        f"clamped={int(n_clamp)} KEclamp/step={float(ke_loss):.3e} "
        f"ovf[ss,sup,mid,cmid,near,cells,g2]={ovf.astype(int).tolist()} "
        f"n_cells={int(n_cells)} ({dt_c:.0f}s)",
        flush=True,
    )
    print(
        f"    P_core(top-decile |a|)={float(p_core):+.4e} "
        f"rel_core={float(rel_core):.2e} rel_halo={float(rel_halo):.2e} "
        f"rel_q50={float(q50):.2e} q90={float(q90):.2e} q99={float(q99):.2e}",
        flush=True,
    )
