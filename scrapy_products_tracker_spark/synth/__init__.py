from .world import BENCH, T1_SMOKE, T2_CORRECTNESS, World, WorldSpec, generate_world, write_world

__all__ = ["BENCH", "T1_SMOKE", "T2_CORRECTNESS", "World", "WorldSpec", "generate_world", "write_world"]
