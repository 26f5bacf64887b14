"""I/O layer (L0): phase-space readers/writers, config, generators.

Mirrors /root/reference/src/io/ so the reference's shipped scenes and
checkpoints load unchanged.
"""
