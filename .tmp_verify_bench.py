import time
import numpy as np, jax
from zktpu.field.spec import BN254_FQ
from zktpu.field import jnp_backend as fb
from zktpu.poly.multilinear import MultilinearPoly
from zktpu.sumcheck import protocol as sc
from zktpu.sumcheck import fused

ctx = fb.get_ctx(BN254_FQ)
nv = 20
rng = np.random.default_rng(0)
vals = rng.integers(0, 1 << 62, size=1 << nv)
poly = MultilinearPoly.from_ints(ctx, [int(v) for v in vals])

t0=time.time(); proof = fused.prove(poly); print(f"fused prove pass1 {time.time()-t0:.3f}s", flush=True)
t0=time.time(); proof = fused.prove(poly); t_p = time.time()-t0; print(f"fused prove warm {t_p:.3f}s", flush=True)
t0=time.time(); ok = sc.verify(poly, proof); print(f"verify pass1 {time.time()-t0:.3f}s ok={ok}", flush=True)
t0=time.time(); ok = sc.verify(poly, proof); t_v = time.time()-t0; print(f"verify warm {t_v:.3f}s ok={ok}", flush=True)
print(f"total prove+verify {t_p+t_v:.3f}s vs baseline 0.45s -> vs_baseline {0.45/(t_p+t_v):.2f}")
