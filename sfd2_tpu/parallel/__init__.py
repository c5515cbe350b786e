from sfd2_tpu.parallel.mesh import make_mesh, shard_batch, replicate
