"""Pure deterministic kernels shared by the Ray pipeline and the oracle.

Each kernel replicates a conformance-critical arithmetic rule of the
reference (file:line citations inline). Keeping them dependency-free and
single-image means the oracle (scalar composition) and the Ray stages
(batched/actor composition) cannot diverge on the math — the conformance
suite then tests the *orchestration*: explode, bucketing, union, merge,
checkpoint/resume.
"""
