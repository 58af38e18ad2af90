"""Inner-step cost of the adaptive runner at 1M: with frozen bands, time
(a) the near band alone, (b) near + integrate, (c) the full runner body
including the rebuild/refresh conds and flat-carry reshapes, all inside
compiled scans (no dispatch overhead).  Pins down where the sustained
step time beyond the phase sums goes.

Usage: _prof_inner.py [n] [steps]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, time

import jax, jax.numpy as jnp

from nbody_tpu.config import SimConfig
from nbody_tpu.init import make_initial_state
from nbody_tpu.state import ParticleState
from nbody_tpu.ops import forces, integrate as integ
from nbody_tpu.models.simulation import (
    sort_by_morton, _adaptive_parts, _pad_cycle_state, _flat, _v3,
)
from nbody_tpu.utils.profiling import _sync

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 32

cfg = SimConfig(n=n, rebuild_every=16, hold_farmid=4, check_overflow=False)
st = make_initial_state(cfg)
codes_s, perm, lo, size = sort_by_morton(st.pos, cfg)
ps, ms, cs = forces.pad_sorted(st.pos[perm], st.mass[perm], cs_ := codes_s,
                               cfg.force_tile)
vel = jnp.pad(st.vel[perm], ((0, ps.shape[0] - n), (0, 0)))
_, supers, bands, tables = jax.jit(
    lambda p, m, c: forces.build_bands(p, m, c, cfg))(ps, ms, cs)
afm = jax.jit(lambda p, s, t: forces.apply_farmid(p, s, t, cfg))(ps, supers, tables)
_sync(afm)


def timed(label, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    out = f(*args)
    _sync(out)
    ms_ = (time.perf_counter() - t0) * 1e3 / steps
    print(f"{label:28s} {ms_:7.2f} ms/step", flush=True)


def scan_near(p, m_, bd):
    def body(c, _):
        a = forces.apply_near(c, c, m_, bd, cfg)
        return c + 1e-6 * a, None
    out, _ = jax.lax.scan(body, p, None, length=steps)
    return out


def scan_near_integ(p, v, m_, bd, af):
    def body(c, _):
        pp, vv = c
        a = af + forces.apply_near(pp, pp, m_, bd, cfg)
        s2 = integ.integrate(ParticleState(pos=pp, vel=vv, mass=m_, acc=a), a, cfg)
        return (s2.pos, s2.vel), None
    out, _ = jax.lax.scan(body, (p, v), None, length=steps)
    return out


def scan_body_noreb(state):
    """The REAL adaptive-runner body scanned with rebuilds never
    triggering (left starts huge), isolating cond/carry/reshape costs."""
    init_carry, body, extract = _adaptive_parts(cfg)
    carry = init_carry(state)
    carry = (carry[0], jnp.int32(10_000_000)) + carry[2:]

    def one(c, _):
        c2 = body(c)
        return (c2[0], jnp.int32(10_000_000)) + tuple(c2[2:]), None

    out, _ = jax.lax.scan(one, carry, None, length=steps)
    return out[6]


def scan_flat(p, v, m_, bd, af):
    """near+integrate with FLAT [3N] carries and _v3 views each step —
    isolates the flat<->padded reshape cost."""
    def body(c, _):
        pf, vf = c
        pp = _v3(pf)
        a = af + forces.apply_near(pp, pp, m_, bd, cfg)
        s2 = integ.integrate(ParticleState(pos=pp, vel=_v3(vf), mass=m_, acc=a), a, cfg)
        return (_flat(s2.pos), _flat(s2.vel)), None
    out, _ = jax.lax.scan(body, (_flat(p), _flat(v)), None, length=steps)
    return out


def scan_flat_cond(p, v, m_, bd, af, sup, tab):
    """scan_flat + the r-RESPA refresh lax.cond every R steps (scalar
    pred) — isolates the cond's materialization cost."""
    r = max(1, cfg.hold_farmid)
    def body(c, _):
        j, pf, vf, aff = c
        refresh = (j % r) == 0
        aff = jax.lax.cond(
            refresh,
            lambda pp: _flat(forces.apply_farmid(_v3(pp), sup, tab, cfg)),
            lambda pp: aff,
            pf,
        )
        pp = _v3(pf)
        a = _v3(aff) + forces.apply_near(pp, pp, m_, bd, cfg)
        s2 = integ.integrate(ParticleState(pos=pp, vel=_v3(vf), mass=m_, acc=a), a, cfg)
        return (j + 1, _flat(s2.pos), _flat(s2.vel), aff), None
    out, _ = jax.lax.scan(body, (jnp.int32(0), _flat(p), _flat(v), _flat(af)),
                          None, length=steps)
    return out


def scan_refresh_nocond(p, v, m_, bd, af, sup, tab):
    """far+mid UNCONDITIONALLY every step (no cond) + near + integrate:
    upper bound showing what the cond saves/costs vs inline refresh."""
    def body(c, _):
        pf, vf = c
        pp = _v3(pf)
        a = forces.apply_farmid(pp, sup, tab, cfg) \
            + forces.apply_near(pp, pp, m_, bd, cfg)
        s2 = integ.integrate(ParticleState(pos=pp, vel=_v3(vf), mass=m_, acc=a), a, cfg)
        return (_flat(s2.pos), _flat(s2.vel)), None
    out, _ = jax.lax.scan(body, (_flat(p), _flat(v)), None, length=steps)
    return out


timed("near only", scan_near, ps, ms, bands)
timed("near + integrate (held afm)", scan_near_integ, ps, vel, ms, bands, afm)
timed("flat carries + reshapes", scan_flat, ps, vel, ms, bands, afm)
timed("flat + refresh cond (R)", scan_flat_cond, ps, vel, ms, bands, afm,
      supers, tables)
timed("farmid every step, no cond", scan_refresh_nocond, ps, vel, ms, bands,
      afm, supers, tables)
timed("full body (no rebuilds)", scan_body_noreb, st)
