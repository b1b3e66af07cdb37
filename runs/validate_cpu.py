import jax
jax.config.update("jax_platforms", "cpu")
import starcat.__main__ as m
m.main(["validate"])
