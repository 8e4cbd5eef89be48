"""ECS core systems (reference layer 3: include/garden/system/*)."""
