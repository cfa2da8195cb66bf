"""Scene-asset layer: mesh / texture / material / light containers and IO,
plus the differentiable render pipeline."""
