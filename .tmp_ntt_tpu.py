import time, numpy as np, jax, jax.numpy as jnp
from zktpu.field.spec import BN254_FR
from zktpu.field import jnp_backend as fb
from zktpu.ntt.ntt import ntt
from zktpu.ntt.pallas_ntt import ntt_pallas

ctx = fb.get_ctx(BN254_FR)
rng = np.random.default_rng(0)
for logn in (12, 20):
    size = 1 << logn
    table = fb.to_mont(ctx, jnp.asarray(rng.integers(0, 1<<16, size=(size,16), dtype=np.uint32)))
    t0=time.time(); ref = ntt(ctx, table); jax.device_get(ref[0]); tcr = time.time()-t0
    t0=time.time(); got = ntt_pallas(ctx, table); jax.device_get(got[0]); tcg = time.time()-t0
    assert np.array_equal(np.asarray(ref), np.asarray(got)), f"TPU NTT mismatch 2^{logn}"
    t0=time.time(); jax.device_get(ntt(ctx, table)[0]); tr = time.time()-t0
    t0=time.time(); jax.device_get(ntt_pallas(ctx, table)[0]); tg = time.time()-t0
    print(f"NTT 2^{logn}: xla {tr*1e3:.1f}ms pallas {tg*1e3:.1f}ms speedup {tr/tg:.1f}x  [compiles {tcr:.0f}s/{tcg:.0f}s]", flush=True)
