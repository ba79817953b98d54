"""Display geoms for the cartpole family (camera tasks render these; the
reference's cartpole.usd carries visual meshes that never collide — same
here via ``collidable=False``)."""

from ..physics.model import GEOM_BOX, GEOM_CAPSULE


def add_cartpole_visuals(b, cart, pole):
    b.add_geom(
        cart, GEOM_BOX, (0.15, 0.10, 0.10),
        rgba=(0.20, 0.45, 0.85, 1.0), collidable=False, name="cart_visual",
    )
    # radius chosen for visibility at the reference camera distance (-7 m,
    # 100 px): a 3 cm pole is subpixel there
    b.add_geom(
        pole, GEOM_CAPSULE, (0.06, 0.50), pos=(0.0, 0.0, 0.5),
        rgba=(0.90, 0.25, 0.20, 1.0), collidable=False, name="pole_visual",
    )
