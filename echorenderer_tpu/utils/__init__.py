from . import vec, rng, accumulator, stats, colors
