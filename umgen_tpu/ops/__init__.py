from umgen_tpu.ops.warp import affine_warp_map

__all__ = ["affine_warp_map"]
