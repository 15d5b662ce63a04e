from umgen_tpu.data.tokenizers import (
    BBox3DTokenizer,
    DigitalBinsTokenizer,
    TextTokenizer,
    default_bbox3d_tokenizer,
    default_ego_tokenizer,
)
from umgen_tpu.data.normalize import MinMaxNormalizer, StandardNormalizer
from umgen_tpu.data.pipeline import ScenePipeline

__all__ = [
    "BBox3DTokenizer",
    "DigitalBinsTokenizer",
    "TextTokenizer",
    "default_bbox3d_tokenizer",
    "default_ego_tokenizer",
    "MinMaxNormalizer",
    "StandardNormalizer",
    "ScenePipeline",
]
