"""Train-kernel TPU bench: s/epoch at the reference recipe vs f32/bf16."""
import time
import numpy as np, jax, jax.numpy as jnp, optax
def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
from specenh.config import ModelConfig, TrainConfig
from specenh.train import create_state, train_epoch, _epoch_batches
from specenh.ops.ae_train_kernel import kernel_train_epoch_fn
from specenh.bench.harness import time_fn

n, bs = 7200, 128
cfg = ModelConfig(); tc = TrainConfig()

@jax.jit
def gen(key):
    x = jax.random.uniform(key, (n, 256, 128, 1), jnp.float32)
    return x, jnp.clip(x * 0.8 + 0.1, 0.0, 1.0)

log("generating")
x, y = gen(jax.random.PRNGKey(0))
np.asarray(y.ravel()[:1])
bi, bm = _epoch_batches(n, bs, np.random.default_rng(0).permutation(n))
bi, bm = jnp.asarray(bi), jnp.asarray(bm)
tx = optax.adam(tc.learning_rate, b1=tc.beta1, b2=tc.beta2, eps=tc.adam_eps)

log("flax f32 baseline")
st = create_state(cfg, tc)
sec32 = time_fn(lambda s: train_epoch(s, x, y, bi, bm), st, iters=4, warmup=2)
log(f"flax f32: {sec32:.4f} s/epoch")
st = create_state(cfg, tc, dtype=jnp.bfloat16)
sec16 = time_fn(lambda s: train_epoch(s, x, y, bi, bm), st, iters=4, warmup=2)
log(f"flax bf16: {sec16:.4f} s/epoch")

for bt in (1, 2, 4):
    try:
        log(f"kernel engine block_tiles={bt}: compiling")
        ep = kernel_train_epoch_fn(cfg, tx, block_tiles=bt)
        st = create_state(cfg, tc)
        st2, losses = ep(st, x, y, bi, bm)
        np.asarray(losses.ravel()[:1])
        log(f"  first-epoch losses head {np.asarray(losses[:3])}")
        sec = time_fn(lambda s: ep(s, x, y, bi, bm), st, iters=4, warmup=1)
        log(f"RESULT kernel bt={bt}: {sec:.4f} s/epoch "
            f"({sec32/sec:.2f}x f32, {sec16/sec:.2f}x bf16), {n/sec:.0f} tiles/s")
    except Exception as e:
        log(f"RESULT kernel bt={bt}: FAILED {type(e).__name__}: {str(e)[:400]}")

# numerics: one epoch kernel vs flax f32 losses
st = create_state(cfg, tc)
_, lf = train_epoch(st, x, y, bi, bm)
ep = kernel_train_epoch_fn(cfg, tx, block_tiles=1)
_, lk = ep(create_state(cfg, tc), x, y, bi, bm)
d = float(jnp.abs(lf - lk).max())
log(f"epoch loss maxdiff kernel(bf16) vs flax f32: {d:.2e}")

# pre-layout engine comparison (appended round 3)
log("kernel engine pre_layout=False")
ep = kernel_train_epoch_fn(cfg, tx, block_tiles=1, pre_layout=False)
st = create_state(cfg, tc)
sec_np = time_fn(lambda s: ep(s, x, y, bi, bm), st, iters=4, warmup=1)
log(f"RESULT kernel no-pre: {sec_np:.4f} s/epoch")
log("kernel engine pre_layout=True")
ep = kernel_train_epoch_fn(cfg, tx, block_tiles=1, pre_layout=True)
st = create_state(cfg, tc)
sec_p = time_fn(lambda s: ep(s, x, y, bi, bm), st, iters=4, warmup=1)
log(f"RESULT kernel pre-layout: {sec_p:.4f} s/epoch ({sec_np/sec_p:.2f}x vs no-pre)")
