"""Safety-evaluation stack (L5/L6): CommonRoad-subset IO, scenario
conversion, motion primitives, A* planning, collision checking, metrics."""
