import time, jax, jax.numpy as jnp, numpy as np, math
from thermalporous_tpu.core.stencil import ScalarStencil

def make(shape, rng):
    up = [jnp.asarray(np.exp(rng.standard_normal(shape)), jnp.float32) for _ in range(3)]
    lo = [jnp.asarray(np.exp(rng.standard_normal(shape)), jnp.float32) for _ in range(3)]
    diag = jnp.asarray(4 + np.abs(rng.standard_normal(shape)), jnp.float32)
    return ScalarStencil(diag=diag, upper=tuple(up), lower=tuple(lo))

rng = np.random.default_rng(0)
def slope(shape):
    st = make(shape, rng)
    v = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    def prog(k):
        @jax.jit
        def run(v):
            def body(i, x):
                y = st.matvec(x)
                return y / (1.0 + jnp.float32(1e-12) * i)
            return jax.lax.fori_loop(0, k, body, v).ravel()[7]
        return run
    pa, pb = prog(50), prog(250)
    for p in (pa, pb):
        jax.device_get(p(v))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps): jax.device_get(pa(v))
    wa = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps): jax.device_get(pb(v))
    wb = (time.perf_counter() - t0) / reps
    return (wb - wa) / 200.0

for shape in [(60, 220, 85), (60, 220, 96), (60, 220, 112), (60, 220, 120),
              (60, 220, 128), (85, 60, 220), (60, 85, 220)]:
    ms = slope(shape) * 1e3
    cells = math.prod(shape)
    print(f"{str(shape):16s} cells={cells:8d}  matvec {ms:6.3f} ms  "
          f"ns/Mcell={ms*1e3/ (cells/1e6):6.1f}", flush=True)
