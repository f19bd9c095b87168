import time, numpy as np, jax
from zktpu.curve import bls12_381 as hc
from zktpu.curve import device as dc
from zktpu.msm import msm_bitsplit

rng = np.random.default_rng(0)
n = 1 << 12
ks = [int(k) for k in rng.integers(1, 1 << 20, size=64)]
base = [hc.multiply(hc.G1_GEN, k) for k in ks]
pts_host = [base[i % 64] for i in range(n)]
scalars = [int(a)*int(b) % hc.R_ORDER or 1 for a,b in rng.integers(1, 1<<62, size=(n,2))]
pts = dc.pack_points(pts_host)
sc = dc.pack_scalars(scalars)
t0=time.time(); jax.device_get(msm_bitsplit(pts, sc)[0]); tc = time.time()-t0
print(f"bitsplit 2^12 compile+run {tc:.0f}s", flush=True)
t0=time.time(); out = msm_bitsplit(pts, sc); jax.device_get(out[0]); t = time.time()-t0
print(f"MSM 2^12 bitsplit: {t:.3f}s ({n/t:.0f} pts/s)", flush=True)
aff = dc.unpack_points(tuple(x[None] for x in out))[0]
# host spot check on a reduced sample is too slow; check vs ladder result instead
t0=time.time(); out2 = dc.msm(pts, sc); jax.device_get(out2[0]); t2 = time.time()-t0
print(f"MSM 2^12 ladder: {t2:.3f}s ({n/t2:.0f} pts/s) [incl possible compile]", flush=True)
aff2 = dc.unpack_points(tuple(x[None] for x in out2))[0]
assert aff == aff2, "bitsplit != ladder on TPU"
print("TPU MSM parity OK")
