from irotavg_tpu.utils.cache import enable_persistent_cache
from irotavg_tpu.utils.sequence import SequenceLoader, load_gray
from irotavg_tpu.utils.timing import StageTimer, device_trace
from irotavg_tpu.utils.viz import draw_matches, plot_matches, save_png

__all__ = ["SequenceLoader", "load_gray", "StageTimer", "device_trace",
           "enable_persistent_cache", "draw_matches", "plot_matches",
           "save_png"]
