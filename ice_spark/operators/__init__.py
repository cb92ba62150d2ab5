"""Custom operators the reference lacks, composed from DataFrame ops.

Each operator is a pure DataFrame→DataFrame function so Catalyst can
optimize through it; none of them collect to the driver.
"""
