"""Ray Data stages: each module exposes batch functions / actor classes for
``Dataset.map_batches`` plus the groupby keys they shuffle on."""
