from . import distributions
from .gae import calc_advantages
from .memory_index import build_memory_indices, build_memory_mask, \
    compute_window_sources, WindowSources
