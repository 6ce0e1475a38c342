"""multiclust-tpu: TPU-native population-structure inference.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the C program
``multiclust`` (reference: /root/reference): maximum-likelihood clustering of
multi-allelic, multi-locus, polyploid genotype data under mixture and admixture
multinomial models, fitted by EM with SQUAREM / quasi-Newton acceleration,
Rand-EM multi-start initialization, simplex projection, AIC/BIC model selection
over a K-sweep, and a parametric-bootstrap likelihood-ratio test of K-1 vs K.

Design highlights (TPU-first, not a port):

* The genotype sufficient statistic is a dense padded tensor ``x[I, L, M]``
  (reference: jagged ``ILM``, read_file.c:633-663) so that both models' E/M
  steps become a handful of large matmuls on the MXU.
* The admixture EM step never materializes the responsibility tensor
  ``d[I,K,L,M]`` (reference: em_alg.c:291-486): it is algebraically folded
  into four matmuls (see model/admixture.py).
* Multi-start / Rand-EM initializations run as vmapped batches of EM chains;
  data parallelism shards individuals across a `jax.sharding.Mesh` with
  XLA-inserted collectives.
* Log-likelihood reductions use two-float ("df64") compensated accumulation
  so that f32 TPU arithmetic still resolves the reference's 1e-4 absolute
  convergence tolerance (the reference is f64 throughout).
"""

__version__ = "0.1.0"

from multiclust_tpu.config import Options, AccelScheme  # noqa: F401
from multiclust_tpu.io.dataset import Dataset  # noqa: F401
