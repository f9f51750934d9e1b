from autolabel_tpu.render.occupancy import OccupancyGrid, OccupancyGridConfig
from autolabel_tpu.render.renderer import (RenderOptions, render_rays,
                                           StagedRenderer)
