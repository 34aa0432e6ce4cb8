from henjou_tpu.integrator.payload import SurfaceHit, Sky, closest_hit, occluded
from henjou_tpu.integrator.pathtrace import pathtrace
