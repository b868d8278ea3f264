from . import vec, rng, accumulator, colors
