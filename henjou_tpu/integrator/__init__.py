from henjou_tpu.integrator.mis import mis
from henjou_tpu.integrator.nee import nee
from henjou_tpu.integrator.pathtrace import pathtrace
from henjou_tpu.integrator.payload import SurfaceHit, Sky, closest_hit, occluded
