from .httpserver import WorldHTTPServer
from .world import BENCH, SCALING, T1_SMOKE, T2_CORRECTNESS, World, WorldSpec, generate_world, write_world

__all__ = ["BENCH", "SCALING", "T1_SMOKE", "T2_CORRECTNESS", "World", "WorldHTTPServer", "WorldSpec", "generate_world", "write_world"]
