import time, numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
# H2D bandwidth probe
for mb in (1, 4):
    a = np.random.randint(0, 255, (mb*1024*1024,), dtype=np.uint8)
    t0=time.perf_counter(); d=jax.device_put(a); float(d[0]); dt=time.perf_counter()-t0
    print(f"H2D {mb} MB: {dt*1e3:.1f} ms -> {mb/dt:.1f} MB/s", flush=True)
# step time at batch 8, 112x112, bf16
from greedy_multimodal_learning_tpu.engine import create_train_state, make_optimizer
from greedy_multimodal_learning_tpu.engine.bdr import GroupReducer
from greedy_multimodal_learning_tpu.engine.steps import build_train_step, make_controller_update
from greedy_multimodal_learning_tpu.models import MMTMMVCNN
for B, S in ((8,112),):
    model = MMTMMVCNN(nclasses=40, num_towers=2, dtype=jnp.bfloat16)
    opt = make_optimizer(lr=0.1)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), jnp.zeros((B,2,S,S,3), jnp.float32))
    gm = GroupReducer(state.params, ["net_view_0","net_view_1"], ["visual","skeleton"])
    step = build_train_step(model, opt, gm, make_controller_update("guided",2,epsilon=.01,curation_windowsize=5))
    r = np.random.default_rng(0)
    batch = {"images": r.integers(0,255,(B,2,S,S,3),dtype=np.uint8), "labels": r.integers(0,40,(B,)).astype(np.int32), "mask": np.ones((B,),np.float32)}
    dbatch = jax.device_put(batch)
    unlock = jnp.asarray(True)
    t0=time.perf_counter()
    for i in range(3): state,out = step(state,dbatch,unlock)
    float(out["loss"]); print(f"B={B} S={S} compile+warmup {time.perf_counter()-t0:.1f}s", flush=True)
    # device-resident step time
    t0=time.perf_counter()
    for i in range(20): state,out = step(state,dbatch,unlock)
    float(out["loss"]); dt=(time.perf_counter()-t0)/20
    print(f"B={B} S={S} device-resident: {dt*1e3:.1f} ms/step", flush=True)
    # with per-step H2D (fresh host batch each step)
    t0=time.perf_counter()
    for i in range(20):
        db = jax.device_put(batch)
        state,out = step(state,db,unlock)
    float(out["loss"]); dt=(time.perf_counter()-t0)/20
    print(f"B={B} S={S} with H2D: {dt*1e3:.1f} ms/step ({B/dt:.0f} samples/s)", flush=True)
