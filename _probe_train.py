import time, jax, numpy as np, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_ppst_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
from ppst_tpu.models.config import PPSTConfig
from ppst_tpu.models.ppst import PPSTModel
from ppst_tpu.train.steps import build_train_steps
from ppst_tpu.util.fast_init import random_params_like

S=512; B=2
cfg = PPSTConfig(crop_size=S)
model = PPSTModel(cfg)
params, state = random_params_like(lambda: model.init(jax.random.PRNGKey(0), S), seed=0)
init_opt, d_step, d_step_r1, g_step = build_train_steps(model, donate=False)
opt_states = init_opt(params)
params, state, opt_states = jax.device_put((params, state, opt_states))
real = jax.random.normal(jax.random.PRNGKey(1),(B,S,S,3))*0.3
mask = jnp.zeros((B,S,S,3)).at[...,0].set(1.0)

def sync(x): np.asarray(jax.tree.leaves(x)[0].ravel()[0])

t0=time.time()
p,s,o,l = d_step(params, state, opt_states, real, mask, jax.random.PRNGKey(2))
sync(l); print(f"d_step compile+run: {time.time()-t0:.0f}s", flush=True)
t0=time.time()
for i in range(5): p,s,o,l = d_step(p,s,o,real,mask,jax.random.PRNGKey(3+i))
sync(l); print(f"d_step steady: {(time.time()-t0)/5*1000:.0f}ms", flush=True)

t0=time.time()
p,s,o,l = g_step(p,s,o,real,mask,jax.random.PRNGKey(9))
sync(l); print(f"g_step compile+run: {time.time()-t0:.0f}s", flush=True)
t0=time.time()
for i in range(5): p,s,o,l = g_step(p,s,o,real,mask,jax.random.PRNGKey(10+i))
sync(l); print(f"g_step steady: {(time.time()-t0)/5*1000:.0f}ms", flush=True)

t0=time.time()
p,s,o,l = d_step_r1(p,s,o,real,mask,jax.random.PRNGKey(20))
sync(l); print(f"d_step_r1 compile+run: {time.time()-t0:.0f}s", flush=True)
print({k: float(v) for k,v in l.items()})
print("TRAIN 512 OK")
