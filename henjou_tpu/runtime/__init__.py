from henjou_tpu.runtime.camera import Camera, camera_rays, make_camera
from henjou_tpu.runtime.options import RenderMode, RenderOption, load_render_option
from henjou_tpu.runtime.renderer import Renderer
