from .em_kernel import fused_em_sampler
from .mh_kernel import fused_mh_scatterometry
