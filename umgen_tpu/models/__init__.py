from umgen_tpu.models import modules, umgen

__all__ = ["modules", "umgen"]
