"""graby_spark — PySpark-native article-extraction engine.

A from-scratch reimplementation of the j0k3r/graby extraction semantics
(reference at /root/reference, PHP) as set-oriented Spark dataflow over
Common-Crawl-style pages tables.  See SURVEY.md for the operator inventory
and the reference file:line citations carried in each module docstring.
"""

__version__ = "0.1.0"
