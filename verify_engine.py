import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np, time, dataclasses
print("devices:", jax.devices(), flush=True)
from avoid_mpc_tpu.config import EngineConfig, MPCConfig, TaskConfig
from avoid_mpc_tpu.engine import EngineHyper, EngineParams, engine_init, receding_step
from avoid_mpc_tpu.mapping import MapShape, map_add_frame, map_init
from avoid_mpc_tpu.models.quadrotor import DynamicsParams, rk4_step

cfg = EngineConfig(mpc=dataclasses.replace(MPCConfig(), sqp_iters=8, sqp_iters_fast=5, speed=5.0), task=TaskConfig(height=1.5))
P = EngineParams.from_config(cfg); H = EngineHyper.from_config(cfg)
dp = DynamicsParams.from_config(cfg.mpc)
shape = MapShape(n_frames=2, points_per_frame=64)

ys = np.linspace(-0.9, 1.1, 8); zs = np.linspace(0.1, 3.0, 8)
yy, zz = np.meshgrid(ys, zs)
wall = np.stack([np.full(64, 4.0), yy.ravel(), zz.ravel()], 1).astype(np.float32)
border = (np.abs(yy.ravel()+0.9)<1e-6)|(np.abs(yy.ravel()-1.1)<1e-6)
m = map_init(shape)
emask = jnp.asarray(border); mask = jnp.ones(64, bool)
m = map_add_frame(m, jnp.asarray(wall), mask, jnp.asarray(wall), emask, jnp.eye(4, dtype=jnp.float32))

@jax.jit
def tick_and_fly(state, quad, m):
    state, out = receding_step(state, quad, m, P, H)
    quad = rk4_step(quad, out.u_cmd, cfg.mpc.con_dt, dp)
    return state, quad, out

state = engine_init(cfg)
quad = jnp.zeros(10, jnp.float32).at[2].set(1.5)
t=time.time(); r = tick_and_fly(state, quad, m); state, quad, out = jax.tree.map(jax.block_until_ready, r); print(f"compile: {time.time()-t:.1f}s", flush=True)
t=time.time()
traj=[np.asarray(quad)]
for i in range(140):
    state, quad, out = tick_and_fly(state, quad, m)
    traj.append(np.asarray(quad))
jax.block_until_ready(quad); wall_t = time.time()-t
traj = np.stack(traj)
clear = np.sqrt(((traj[:,None,:3]-wall[None])**2).sum(-1)).min()
print(f"140 closed-loop ticks on TPU: {wall_t:.2f}s ({wall_t/140*1000:.1f} ms/tick)", flush=True)
print(f"final x={traj[-1,0]:.2f} y={traj[-1,1]:.2f} z={traj[-1,2]:.2f} vx={traj[-1,4]:.2f} | min clearance {clear:.3f}", flush=True)
print("all finite:", np.isfinite(traj).all(), flush=True)
