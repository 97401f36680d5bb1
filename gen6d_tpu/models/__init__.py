from gen6d_tpu.models.detector import Detector
from gen6d_tpu.models.selector import ViewpointSelector
from gen6d_tpu.models.refiner import VolumeRefiner

name2network = {
    'detector': Detector,
    'selector': ViewpointSelector,
    'refiner': VolumeRefiner,
}
