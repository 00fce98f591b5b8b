"""Model-agnostic explainers (LIME + KernelSHAP).

Parity: reference ``core/.../explainers/`` (LIMEBase.scala,
KernelSHAPBase.scala, Sampler.scala, LassoRegression.scala,
LeastSquaresRegression.scala).
"""

from mmlspark_spark.explainers.lime import TabularLIME, VectorLIME
from mmlspark_spark.explainers.shap import TabularSHAP, VectorSHAP

__all__ = ["TabularLIME", "VectorLIME", "TabularSHAP", "VectorSHAP"]
