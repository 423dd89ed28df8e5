"""HBM bandwidth probe: stream-rate variants beyond the roofline's copy.

Measured v5e (2026-08-17): f32 scale+add 467 / relu 454 / triad 533 /
reduce 310 GB/s; bf16 scale+add 334 / relu 304 / triad 408 / reduce 262
GB/s (bytes counted as reads+writes).  Takeaway: the VPU is ELEMENT-rate
limited — bf16 elementwise chains run at roughly the same elements/sec
as f32, so halving bytes does NOT halve time outside conv/matmul DMAs.
Used to contextualize PERF.json's %HBM columns (see peaks.note).
"""
import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sg2im_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp

def sync(x): return float(jnp.asarray(x).astype(jnp.float32).sum())

def meas(name, fn, args, bytes_moved, iters=20):
    c = jax.jit(fn).lower(*args).compile()
    out = c(*args); sync(out); out = c(*args); sync(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = c(*args)
    sync(out)
    dt = (time.perf_counter()-t0)/iters
    print(f"{name:28s}: {dt*1e3:7.3f} ms  {bytes_moved/dt/1e9:7.1f} GB/s", flush=True)

rng = np.random.RandomState(0)
GB = 1<<30
for dtype, tag in [(jnp.float32,'f32'), (jnp.bfloat16,'bf16')]:
    x = jnp.asarray(rng.randn(256,1024,1024), dtype)   # 1GB f32 / 0.5GB bf16
    y = jnp.asarray(rng.randn(256,1024,1024), dtype)
    nb = x.nbytes
    meas(f'scale+add {tag}', lambda a: a*1.0000001+1e-7, (x,), 2*nb)
    meas(f'copyish relu {tag}', lambda a: jnp.maximum(a, 0), (x,), 2*nb)
    meas(f'triad {tag}', lambda a,b: a+b*1.0001, (x,y), 3*nb)
    meas(f'reduce-sum {tag}', lambda a: a.sum(), (x,), nb)
# small-array variant (CRN-tensor sized): 128x128x128x160 bf16 = 671MB
z = jnp.asarray(rng.randn(128,128,128,160), jnp.bfloat16)
meas('crn-sized scale bf16', lambda a: a*1.0000001, (z,), 2*z.nbytes)
