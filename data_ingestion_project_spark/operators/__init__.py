"""Composite operators: multi-step DataFrame transformations.

Each operator is a function ``DataFrame -> DataFrame`` (or a small
factory of one) built from declarative primitives so Catalyst can
optimize through them.
"""
