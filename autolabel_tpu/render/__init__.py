from autolabel_tpu.render.renderer import (RenderOptions, render_rays,
                                           StagedRenderer)
