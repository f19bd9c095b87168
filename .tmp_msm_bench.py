import time, numpy as np, jax
from zktpu.curve import bls12_381 as hc
from zktpu.curve import device as dc
from zktpu.msm import msm_bitsplit

rng = np.random.default_rng(0)
for logn in (12, 14, 16):
    n = 1 << logn
    ks = [int(k) for k in rng.integers(1, 1 << 20, size=64)]
    base = [hc.multiply(hc.G1_GEN, k) for k in ks]
    pts_host = [base[i % 64] for i in range(n)]
    scalars = [int(a)*int(b) % hc.R_ORDER or 1 for a,b in rng.integers(1, 1<<62, size=(n,2))]
    pts = dc.pack_points(pts_host)
    sc = dc.pack_scalars(scalars)
    for name, f in (("ladder", dc.msm), ("bitsplit", msm_bitsplit)):
        t0=time.time(); jax.device_get(f(pts, sc)[0]); tc = time.time()-t0
        t0=time.time(); jax.device_get(f(pts, sc)[0]); t = time.time()-t0
        print(f"MSM 2^{logn} {name}: {t:.3f}s ({n/t:.0f} pts/s)  [compile {tc:.0f}s]", flush=True)
