from georiva_spark.plans.recipes.promotion import PromotionRecipe
from georiva_spark.plans.recipes.climatology import ClimatologyRecipe
from georiva_spark.plans.recipes.rolling_anomaly import RollingAnomalyRecipe

__all__ = ["PromotionRecipe", "ClimatologyRecipe", "RollingAnomalyRecipe"]
