from georiva_spark.plans.recipes.promotion import PromotionRecipe
from georiva_spark.plans.recipes.climatology import ClimatologyRecipe

__all__ = ["PromotionRecipe", "ClimatologyRecipe"]
