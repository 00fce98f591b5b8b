"""Model-agnostic explainers (LIME + KernelSHAP).

Parity: reference ``core/.../explainers/`` (LIMEBase.scala,
KernelSHAPBase.scala, Sampler.scala, LassoRegression.scala,
LeastSquaresRegression.scala).
"""

from mmlspark_spark.explainers.lime import TabularLIME, VectorLIME
from mmlspark_spark.explainers.shap import TabularSHAP, VectorSHAP
from mmlspark_spark.explainers.superpixel import SuperpixelTransformer
from mmlspark_spark.explainers.text_image import (
    ImageLIME,
    ImageSHAP,
    TextLIME,
    TextSHAP,
)

__all__ = ["TabularLIME", "VectorLIME", "TabularSHAP", "VectorSHAP",
           "TextLIME", "TextSHAP", "ImageLIME", "ImageSHAP",
           "SuperpixelTransformer"]
