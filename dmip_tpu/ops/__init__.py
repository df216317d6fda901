from .em_kernel import fused_em_sampler, fused_em_sampler_cdiffe
from .mh_kernel import fused_mh_scatterometry
