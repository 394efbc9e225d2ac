import time
import numpy as np
import jax, jax.numpy as jnp
import bbmap_tpu.ops.msa_pallas as mp
import bbmap_tpu.ops.msa_jax as mj

rng = np.random.default_rng(0)
bases = np.frombuffer(b"ACGT", np.uint8)
R, Cn = 150, 150 + 8 + 64
def mk(B, C):
    reads = rng.choice(bases, size=(B, R))
    refs = rng.choice(bases, size=(B, C))
    refs[:, 10:10+R] = reads
    mut = rng.random((B, C)) < 0.03
    refs = np.where(mut, rng.choice(bases, size=(B, C)), refs)
    rows = np.full(B, R, np.int32)
    return jnp.asarray(reads), jnp.asarray(refs), jnp.asarray(rows)

K = 8
def timed(f, *a):
    g = jax.jit(lambda *a: jax.lax.fori_loop(
        0, K, lambda i, acc: acc + f(*a)[0].sum() + i, jnp.int32(0)))
    float(g(*a))
    t0 = time.perf_counter()
    r = float(g(*a))
    dt = time.perf_counter() - t0
    return dt / K

B = 12288
reads, refs, rows = mk(B, Cn)
x = timed(lambda rd, rf, ro: mj.msa_score_batch_var(rd, rf, ro, R, Cn), reads, refs, rows)
print(f"score XLA   B={B} Cn={Cn}: {x*1e3:.1f} ms")
ops = mp.prep_operands_t_device(reads, refs, rows, R, Cn)
for BB in (256, 512):
    p = timed(lambda *o: (mp.msa_score_pallas_t(*o, R, Cn, BB),), *ops)
    print(f"score Pallas BB={BB}: {p*1e3:.1f} ms  ({x/p:.2f}x)")

B = 4096
reads, refs, rows = mk(B, Cn)
x = timed(lambda rd, rf: (mj.msa_trace_batch(rd, rf, R, Cn)[0],), reads, refs)
print(f"fill XLA    B={B}: {x*1e3:.1f} ms")
ops = mp.prep_operands_t_device(reads, refs, rows, R, Cn)
for BB in (128,):
    p = timed(lambda *o: (mp.msa_fill_pallas_t(*o, R, Cn, BB)[1].astype(jnp.int32),), *ops)
    print(f"fill Pallas BB={BB}: {p*1e3:.1f} ms  ({x/p:.2f}x)")
