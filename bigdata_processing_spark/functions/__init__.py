"""Reusable Column-expression function library (all JVM-side built-ins;
no Python row-at-a-time UDFs in any hot path)."""
