from naf_tpu.models.naf import NAF, ImageEncoder  # noqa: F401
from naf_tpu.models.simple import Bilinear, Nearest  # noqa: F401
from naf_tpu.models.jbf import JBF  # noqa: F401
from naf_tpu.models.featup import FeatUp, JBU, JBULearnedRange  # noqa: F401
from naf_tpu.models.jafar import JAFAR  # noqa: F401
from naf_tpu.models.restorers import IRCNN, REDNet  # noqa: F401
from naf_tpu.models.restormer import Restormer  # noqa: F401
from naf_tpu.models.anyup import AnyUpsampler  # noqa: F401
from naf_tpu.models.registry import ModelWrapper, build_model, register  # noqa: F401
