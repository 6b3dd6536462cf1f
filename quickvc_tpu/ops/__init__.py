"""Op layer: segment slicing, fused kernels (Pallas), and op utilities."""

from quickvc_tpu.ops.slicing import rand_slice_segments, slice_segments  # noqa: F401
