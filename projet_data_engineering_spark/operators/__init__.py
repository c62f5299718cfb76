"""Operator modules. Importing a module registers its driver queries
(see ``projet_data_engineering_spark.registry``)."""
