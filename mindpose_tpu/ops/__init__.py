from . import heatmap
