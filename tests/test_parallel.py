"""Parallelism: mesh construction, DP sharding, spatial halo conv, DP loop."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from unetsulc_tpu.parallel.halo import conv3d_spatial, spatial_sharding
from unetsulc_tpu.parallel.mesh import batch_sharding, make_mesh, replicate


def test_make_mesh_shapes():
    m = make_mesh(data=4, space=2)
    assert m.devices.shape == (4, 2)
    assert m.axis_names == ("data", "space")
    m2 = make_mesh(space=2)  # data = all/2
    assert m2.devices.shape == (4, 2)


def test_batch_sharding_placement():
    mesh = make_mesh(data=8, space=1)
    x = np.arange(8 * 4 * 4 * 4 * 1, dtype=np.float32).reshape(8, 4, 4, 4, 1)
    xd = jax.device_put(x, batch_sharding(mesh))
    assert len(xd.addressable_shards) == 8
    assert xd.addressable_shards[0].data.shape == (1, 4, 4, 4, 1)


def test_halo_conv_matches_dense():
    """Sharded halo conv == unsharded same-padding conv."""
    mesh = make_mesh(data=1, space=8)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 16, 8, 8, 4)).astype(np.float32)
    k = rng.normal(size=(3, 3, 3, 4, 6)).astype(np.float32)

    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x),
        jnp.asarray(k),
        (1, 1, 1),
        ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    xd = jax.device_put(jnp.asarray(x), spatial_sharding(mesh))
    out = conv3d_spatial(xd, jnp.asarray(k), mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_data_parallel_training_loop(cohort_dir):
    """learning() with tpu.data_parallel=2 runs on the CPU mesh and matches
    the reference schema."""
    import json
    import os.path as op

    from unetsulc_tpu.config import TpuConfig
    from unetsulc_tpu.method.training import TrainingSulciLabeller

    with open(op.join(str(cohort_dir), "cohorts", "cohort-Synth6_hemi-L.json")) as f:
        graphs = [s["graph"] for s in json.load(f)["subjects"]]
    m = TrainingSulciLabeller(
        graphs,
        "L",
        working_path=str(cohort_dir),
        dict_model={"name": "DPModel", "num_filter": 8},
        tpu=TpuConfig(
            compute_dtype="float32", prefetch=0, data_parallel=2
        ),
    )
    m.extract_data_from_graphs()
    rc = m.learning(
        lr=0.05,
        momentum=0.9,
        num_epochs=1,
        gfile_list_train=graphs[:4],
        gfile_list_test=graphs[4:],
        batch_size=2,
        save_results=True,
    )
    assert rc == 0
    assert len(m.results["epoch_loss_train"][0]) == 1
    assert np.isfinite(m.results["epoch_loss_train"][0][0])


def test_replicated_state():
    mesh = make_mesh(data=8)
    x = jnp.ones((4, 4))
    xd = jax.device_put(x, replicate(mesh))
    assert xd.sharding.spec == P()
