"""Mesh/data-parallel plumbing on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from simplenerf_tpu.parallel import (
    batch_sharding,
    initialize_distributed,
    make_mesh,
    process_local_rows,
    shard_ray_batch,
    shard_ray_batch_local,
)


class TestMesh:
    def test_make_mesh_all_devices(self):
        mesh = make_mesh()
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("rays",)

    def test_shard_ray_batch_places_leading_axis(self):
        mesh = make_mesh()
        x = jnp.arange(64, dtype=jnp.float32).reshape(64, 1)
        (sx,) = shard_ray_batch(mesh, (x,))
        assert sx.sharding == batch_sharding(mesh)
        np.testing.assert_array_equal(np.asarray(sx), np.asarray(x))

    def test_local_feed_matches_global_single_process(self):
        mesh = make_mesh()
        x = jnp.arange(32, dtype=jnp.int32)
        rows = process_local_rows(32)
        assert rows == slice(0, 32)  # single process owns everything
        (a,) = shard_ray_batch(mesh, (x,))
        (b,) = shard_ray_batch_local(mesh, (x[rows],))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_initialize_distributed_noop_single_process(self):
        initialize_distributed()  # must not raise or hang
        assert jax.process_count() == 1

    def test_psum_over_rays_axis(self):
        """A manual collective over the mesh axis sees every shard."""
        from jax.sharding import PartitionSpec as P

        mesh = make_mesh()
        x = jnp.ones((8, 4))

        def f(x):
            return jax.lax.psum(jnp.sum(x), "rays")

        total = jax.shard_map(f, mesh=mesh, in_specs=P("rays"), out_specs=P())(x)
        assert float(total) == 32.0
