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
t0=time.time()
vals = rng.integers(0, 1 << 62, size=1 << nv)
poly = MultilinearPoly.from_ints(ctx, [int(v) for v in vals])
print(f"table build {time.time()-t0:.2f}s", flush=True)

t0=time.time()
p1 = fused.prove(poly)
print(f"fused prove (compile+run) {time.time()-t0:.2f}s", flush=True)
t0=time.time()
p2 = fused.prove(poly)
t_fused = time.time()-t0
print(f"fused prove (warm) {t_fused:.3f}s", flush=True)
assert p1.proof_polynomials == p2.proof_polynomials

t0=time.time()
p3 = sc.prove(poly)
print(f"host-loop prove (compile+run) {time.time()-t0:.2f}s", flush=True)
t0=time.time()
p4 = sc.prove(poly)
t_loop = time.time()-t0
print(f"host-loop prove (warm) {t_loop:.3f}s", flush=True)
assert p3.proof_polynomials == p1.proof_polynomials, "fused != host-loop at 2^20"
print("bit-exact at 2^20 OK")

t0=time.time()
ok = sc.verify(poly, p1)
print(f"verify {time.time()-t0:.3f}s ok={ok}")
