import time
import numpy as np, jax, jax.numpy as jnp
from zktpu.field.spec import BN254_FQ
from zktpu.field import jnp_backend as fb
from zktpu.field.host import vec_to_bytes
from zktpu.hash import keccak as hk
from zktpu.poly.multilinear import MultilinearPoly
from zktpu.sumcheck import fused
from zktpu.hash import keccak_device as kd

ctx = fb.get_ctx(BN254_FQ)
nv = 20
rng = np.random.default_rng(0)
vals = rng.integers(0, 1 << 62, size=1 << nv)
poly = MultilinearPoly.from_ints(ctx, [int(v) for v in vals])
_ = fused.prove(poly)  # warm

t0=time.time(); canonical = np.asarray(poly.canonical_table()); t1=time.time()
claimed = fused.host_sum_mod_p(ctx, canonical); t2=time.time()
prefix = ctx.canonical_to_bytes(canonical) + vec_to_bytes(ctx.spec, [claimed]); t3=time.time()
state0, tail = hk.sponge_state_after(prefix); t4=time.time()
tail_lanes = kd.bytes_to_lanes(tail) if tail else np.zeros((0,2), np.uint32)
rows = fused._device_prove(ctx, nv, len(tail), jnp.asarray(state0), jnp.asarray(tail_lanes), poly.table); t5=time.time()
flat = np.asarray(rows); t6=time.time()
ints = [int(v) for v in ctx.unpack(flat.reshape(-1, ctx.num_limbs))]; t7=time.time()
print(f"canonical_table {t1-t0:.3f}s")
print(f"host_sum        {t2-t1:.3f}s")
print(f"to_bytes        {t3-t2:.3f}s")
print(f"keccak 32MB     {t4-t3:.3f}s  ({len(prefix)/1e6/(t4-t3):.0f} MB/s)")
print(f"device dispatch {t5-t4:.3f}s (async)")
print(f"fetch rows      {t6-t5:.3f}s")
print(f"unpack          {t7-t6:.3f}s")
print(f"total           {t7-t0:.3f}s")
