import jax
import jax.numpy as jnp
import numpy as np

from cilrs_tpu.config import WEATHER_NAMES
from cilrs_tpu.core.state import make_world
from cilrs_tpu.maps.network import light_states
from cilrs_tpu.render import render_frame
from cilrs_tpu.render.camera import CameraSpec, camera_position, ray_directions


def _world_on_road(net, weather_idx=0):
    wp = int(np.asarray(net.spawn_wp)[0])
    xy = np.asarray(net.wp_xy)[wp]
    yaw = float(np.asarray(net.wp_yaw)[wp])
    world = make_world(num_vehicles=4, num_pedestrians=2, weather_idx=weather_idx)
    # NPC 25 m ahead in the lane; pedestrian to the side.
    fwd = np.array([np.cos(yaw), np.sin(yaw)])
    world = world.replace(
        veh_pos=jnp.asarray(np.stack([xy, xy + fwd * 25.0, xy + fwd * 60.0, xy - fwd * 15.0]).astype(np.float32)),
        veh_yaw=jnp.full((4,), yaw, jnp.float32),
        veh_alive=jnp.ones(4, bool),
        ped_pos=jnp.asarray((xy + fwd * 12.0 + np.array([0.0, 3.0])).astype(np.float32))[None].repeat(2, 0),
        ped_alive=jnp.ones(2, bool),
    )
    return world, xy, yaw


def test_ray_directions_geometry():
    spec = CameraSpec()
    rays = ray_directions(spec, jnp.asarray(0.0))
    assert rays.shape == (spec.height, spec.width, 3)
    # Center ray points along +x, roughly level.
    c = np.asarray(rays[spec.height // 2, spec.width // 2])
    assert c[0] > 0.95 and abs(c[1]) < 0.05
    # Bottom rows point downward (ground visible).
    assert float(rays[-1, spec.width // 2, 2]) < -0.2
    # Left edge points left (+y for yaw=0... right-handed: u>0 is right = -y)
    assert float(rays[spec.height // 2, 0, 1]) > 0.3


def test_camera_position_offset():
    spec = CameraSpec()
    p = camera_position(spec, jnp.asarray([10.0, 5.0]), jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(p), [12.0, 5.0, 1.4], atol=1e-6)


def test_render_smoke_all_weathers(mini_town):
    net = mini_town
    for widx in range(len(WEATHER_NAMES)):
        world, _, _ = _world_on_road(net, weather_idx=widx)
        ls = light_states(net, world.time_s)
        img = jax.jit(lambda w: render_frame(net, w, light_states(net, w.time_s)))(world)
        a = np.asarray(img)
        assert a.shape == (88, 200, 3)
        assert np.isfinite(a).all()
        assert a.min() >= 0.0 and a.max() <= 1.0
        assert a.std() > 0.01, f"flat image for weather {widx}"


def test_render_sees_road_and_sky(mini_town):
    world, _, _ = _world_on_road(mini_town, weather_idx=0)
    img = np.asarray(render_frame(mini_town, world, light_states(mini_town, world.time_s)))
    # Top rows are sky (bluish: b > r), bottom rows are ground (dark asphalt).
    top = img[:10].mean(axis=(0, 1))
    assert top[2] > top[0]
    bottom = img[-10:].mean(axis=(0, 1))
    assert bottom.mean() < 0.5


def test_render_weathers_differ(mini_town):
    imgs = []
    for widx in [0, 3]:  # clear vs night
        world, _, _ = _world_on_road(mini_town, weather_idx=widx)
        imgs.append(np.asarray(render_frame(mini_town, world, light_states(mini_town, world.time_s))))
    assert imgs[0].mean() > imgs[1].mean() + 0.05  # night is darker


def test_render_npc_visible(mini_town):
    world, xy, yaw = _world_on_road(mini_town, weather_idx=0)
    ls = light_states(mini_town, world.time_s)
    with_npc = np.asarray(render_frame(mini_town, world, ls))
    world_empty = world.replace(veh_alive=world.veh_alive.at[1:].set(False),
                                ped_alive=world.ped_alive.at[:].set(False))
    without = np.asarray(render_frame(mini_town, world_empty, ls))
    diff = np.abs(with_npc - without).mean()
    assert diff > 1e-4, "NPC vehicle not visible in render"


def test_render_brake_lights_off_by_default(mini_town):
    """Brake lamps are OFF by default: two A/B runs (runs/r4a vs r4b, r4d vs
    r4b) measured the emissive-lamp cue as a shortcut feature that collapses
    LEFT/RIGHT steering ("red glow => steer 0" on junction queue frames). The
    default render must therefore be invariant to lead-vehicle brake input;
    the tamed cue stays available behind CILRS_TPU_LAMPS=1 for ablations."""
    import cilrs_tpu.render.raster as raster

    world, xy, yaw = _world_on_road(mini_town, weather_idx=0)
    fwd = np.array([np.cos(yaw), np.sin(yaw)])
    world = world.replace(
        veh_pos=world.veh_pos.at[1].set(jnp.asarray(xy + fwd * 12.0, jnp.float32)),
        ped_alive=world.ped_alive.at[:].set(False),
    )
    ls = light_states(mini_town, world.time_s)

    def red_px(img):
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        return int(((r > 0.5) & (r > g * 2.5) & (r > b * 2.5)).sum())

    braking = world.replace(veh_control=world.veh_control.at[1, 2].set(0.8))
    n_brake = red_px(np.asarray(render_frame(mini_town, braking, ls)))
    n_coast = red_px(np.asarray(render_frame(mini_town, world, ls)))
    assert not raster._LAMPS  # env must not leak the ablation flag into tests
    assert abs(n_brake - n_coast) <= 2, (n_brake, n_coast)

    # Opt-in path still renders the (tamed, hard-brake-gated) cue.
    try:
        raster._LAMPS = True
        jax.clear_caches()
        n_brake_on = red_px(np.asarray(render_frame(mini_town, braking, ls)))
        n_coast_on = red_px(np.asarray(render_frame(mini_town, world, ls)))
        assert n_brake_on >= n_coast_on + 8, (n_brake_on, n_coast_on)
    finally:
        raster._LAMPS = False
        jax.clear_caches()


def test_render_night_taillights_opt_in(mini_town):
    """Night taillights are OFF by default: even a constant, brake-
    decorrelated lamp measurably degrades turn steering (round-5 A/B pairs
    r5a-vs-arm4 and arm3-vs-arm2 on bit-identical trajectories: 1.26x/1.5x
    LEFT steer MAE — a visible vehicle at night is mostly queue/follow
    context, so the cue concentrates on low-steer frames). The opt-in
    variant must still render constant, brake-decorrelated lamps."""
    import cilrs_tpu.render.raster as raster

    world, xy, yaw = _world_on_road(mini_town, weather_idx=3)  # night
    fwd = np.array([np.cos(yaw), np.sin(yaw)])
    world = world.replace(
        veh_pos=world.veh_pos.at[1].set(jnp.asarray(xy + fwd * 10.0, jnp.float32)),
        ped_alive=world.ped_alive.at[:].set(False),
    )
    ls = light_states(mini_town, world.time_s)

    def red_px(img):
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        return int(((r > 0.4) & (r > g * 2.5) & (r > b * 2.5)).sum())

    assert not raster._NIGHT_LAMPS  # default OFF (measured turn regression)
    braking = world.replace(veh_control=world.veh_control.at[1, 2].set(0.8))
    n_coast = red_px(np.asarray(render_frame(mini_town, world, ls)))
    n_brake = red_px(np.asarray(render_frame(mini_town, braking, ls)))
    assert n_coast <= 2 and n_brake <= 2, (n_coast, n_brake)

    # Opt-in: lamps visible, constant, brake-decorrelated.
    try:
        raster._NIGHT_LAMPS = True
        jax.clear_caches()
        n_on_coast = red_px(np.asarray(render_frame(mini_town, world, ls)))
        n_on_brake = red_px(np.asarray(render_frame(mini_town, braking, ls)))
        assert n_on_coast >= 6, n_on_coast
        assert n_on_brake == n_on_coast, (n_on_brake, n_on_coast)
    finally:
        raster._NIGHT_LAMPS = False
        jax.clear_caches()


def test_motion_blur_speed_cue(mini_town):
    """Frames must carry a monotonic visual speed cue (CARLA camera motion
    blur parity) so the aux speed head has something to learn from."""
    from cilrs_tpu.render.raster import motion_blur

    world, _, _ = _world_on_road(mini_town, weather_idx=0)
    ls = light_states(mini_town, world.time_s)

    def sharpness(speed):
        w = world.replace(veh_speed=world.veh_speed.at[0].set(speed / 3.6))
        img = np.asarray(render_frame(mini_town, w, ls))
        gx = np.abs(np.diff(img, axis=1)).mean()
        gy = np.abs(np.diff(img, axis=0)).mean()
        return gx + gy

    s0, s15, s35 = sharpness(0.0), sharpness(15.0), sharpness(35.0)
    assert s0 > s15 > s35, f"blur not monotonic in speed: {s0} {s15} {s35}"

    # Stationary frames are untouched (blur weight collapses to the sharp tap).
    img = jnp.ones((8, 16, 3)) * jnp.linspace(0, 1, 16)[None, :, None]
    out = motion_blur(img, jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_motion_stretch_grain_cue(mini_town):
    """Ground grain must elongate along the travel direction with speed
    (exposure smear): along-motion pixel gradients of the ground shrink
    relative to cross-motion ones as speed rises — the aux speed head's
    strongest per-frame cue."""
    from cilrs_tpu.render.raster import _hash2, _motion_stretch

    import jax.numpy as jnp

    # Pure-texture check, no renderer in the way: sample the stretched hash
    # on a fine world grid and compare directional finite differences.
    xs = np.linspace(0.0, 20.0, 400)
    ys = np.linspace(0.0, 8.0, 160)
    gx, gy = np.meshgrid(xs, ys)
    pts = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], axis=1))

    def aniso(speed_ms):
        s = _motion_stretch(pts, jnp.asarray(0.0), jnp.asarray(speed_ms))
        t = np.asarray(_hash2(s, 1.7)).reshape(160, 400)
        d_along = np.abs(np.diff(t, axis=1)).mean()   # x = travel direction
        d_cross = np.abs(np.diff(t, axis=0)).mean()
        return d_along / d_cross

    a0, a8, a12 = aniso(0.0), aniso(8.33), aniso(12.5)
    assert a0 > a8 > a12, f"stretch not monotone in speed: {a0} {a8} {a12}"
    # Stationary: no stretch at all.
    s = _motion_stretch(pts, jnp.asarray(1.3), jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(s), np.asarray(pts), atol=1e-6)


def test_autopilot_longitudinal_continuity():
    """The teacher's throttle/brake must be continuous through the cruise point
    (v_err = 0): a jump there makes BC labels oscillate between two values for
    near-identical observations, collapsing the throttle correlation."""
    from cilrs_tpu.agent.autopilot import autopilot_controls
    from cilrs_tpu.maps.routing import Route

    n = 64
    xy = np.stack([np.arange(n, dtype=np.float32) * 2.0, np.zeros(n, np.float32)], -1)
    route = Route(
        xy=jnp.asarray(xy), yaw=jnp.zeros(n), option=jnp.zeros(n, jnp.int32),
        wp_index=jnp.arange(n, dtype=jnp.int32), valid=jnp.ones(n, bool),
        length=jnp.asarray(n, jnp.int32), kappa=jnp.zeros(n),
    )
    pos = jnp.asarray([0.0, 0.0])
    speeds = np.linspace(25.0, 35.0, 101)  # sweep through the 30 km/h target
    thr, brk = [], []
    for s in speeds:
        _, t, b = autopilot_controls(
            route, jnp.asarray(0, jnp.int32), pos, jnp.asarray(0.0),
            jnp.asarray(s, jnp.float32), jnp.asarray(100.0), jnp.asarray(0, jnp.int32),
        )
        thr.append(float(t))
        brk.append(float(b))
    dthr = np.abs(np.diff(thr)).max()
    dbrk = np.abs(np.diff(brk)).max()
    assert dthr < 0.05, f"throttle jump {dthr:.3f} across a 0.1 km/h speed step"
    assert dbrk < 0.05, f"brake jump {dbrk:.3f} across a 0.1 km/h speed step"
