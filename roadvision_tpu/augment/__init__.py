from .fog import (FOG_PRESETS, EnhancedFogSynthesizer, box_mean,
                  gaussian_blur, guided_filter, rand_perlin)

__all__ = ["EnhancedFogSynthesizer", "FOG_PRESETS", "rand_perlin",
           "guided_filter", "box_mean", "gaussian_blur"]
