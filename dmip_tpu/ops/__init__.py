from .em_kernel import fused_em_sampler
