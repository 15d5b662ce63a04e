from umgen_tpu.models import modules, quantize, umgen

__all__ = ["modules", "quantize", "umgen"]
