import sys, time
import numpy as np, jax, jax.numpy as jnp
def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
log("importing specenh")
from specenh.bench.harness import example_shot, make_enhance_shot_fn, time_fn
from specenh.config import ModelConfig, SpecParams
from specenh.models.autoencoder import make_model

sp = SpecParams()
geoms = {
    "k3": ModelConfig(),
    "k5": ModelConfig(kernels=((5,5),(5,5)), out_kernel=(5,5)),
    "k7": ModelConfig(kernels=((7,7),(7,7)), out_kernel=(7,7)),
    "manual": ModelConfig(filters=(64,32), kernels=((5,5),(5,5)), out_kernel=(5,5)),
}
log("generating traces on device (tunnel upload too slow)")
key = jax.random.PRNGKey(0)
traces = jax.jit(lambda k: jax.random.normal(k, (20, sp.n_samples), jnp.float32))(key)
np.asarray(traces.ravel()[:1])
log("generated")
for name, cfg in geoms.items():
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(0), np.zeros((1, *cfg.input_shape), np.float32))
    log(name, "compiling flax path")
    fn_fx = make_enhance_shot_fn(cfg, sp, use_kernel=False)
    _, ef = fn_fx(params, traces); np.asarray(ef.ravel()[:1])
    log(name, "timing flax path")
    t_fx = time_fn(fn_fx, params, traces, iters=12, warmup=1)
    log(name, f"flax {t_fx*1e3:.2f} ms")
    try:
        fn_k = make_enhance_shot_fn(cfg, sp, use_kernel=True)
        log(name, "compiling kernel path")
        _, ek = fn_k(params, traces); np.asarray(ek.ravel()[:1])
        err = float(jnp.abs(ek - ef).max())
        log(name, "timing kernel path")
        t_k = time_fn(fn_k, params, traces, iters=12, warmup=1)
        log(f"RESULT {name}: flax {t_fx*1e3:.2f} ms  kernel {t_k*1e3:.2f} ms  "
            f"speedup {t_fx/t_k:.2f}x  maxerr {err:.2e}")
    except Exception as e:
        log(f"RESULT {name}: flax {t_fx*1e3:.2f} ms  kernel FAILED: {type(e).__name__}: {str(e)[:300]}")
