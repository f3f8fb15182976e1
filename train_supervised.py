#!/usr/bin/env python
"""Headless offline-training entry (reference train_supervised.py parity).

Usage:
  python train_supervised.py data_dir=<npz dir> output=<out> [offline_training=True]
  python train_supervised.py collect=True checkpoint=<teacher ckpt> data_dir=<out dir>
"""

import sys


def main(argv=None):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    kv = dict(a.split("=", 1) for a in (argv or sys.argv[1:]) if "=" in a)
    data_dir = kv.get("data_dir", "outputs/trajectories")
    out = kv.get("output", "outputs/offline")

    if kv.get("collect", "False").lower() == "true":
        from isaacgyminsertion_tpu.algo.collect import collect_teacher_rollouts
        from isaacgyminsertion_tpu.assets import build_subassembly_set
        from isaacgyminsertion_tpu.envs.config import default_task_config
        from isaacgyminsertion_tpu.models.actor_critic import ActorCriticSplit
        from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand
        from isaacgyminsertion_tpu.utils.checkpoint import restore_path

        import dataclasses

        cfg = default_task_config()
        flag = lambda k: kv.get(k, "False").lower() == "true"
        # sensor modalities recorded into the trajectories (side arrays)
        cfg = cfg.replace(env=dataclasses.replace(
            cfg.env,
            tactile=flag("tactile"),
            external_cam=flag("depth_cam") or flag("seg_cam") or flag("pcl_cam"),
            depth_cam=flag("depth_cam"), seg_cam=flag("seg_cam"),
            pcl_cam=flag("pcl_cam"),
        ))
        model = build_kuka_openhand()
        subs = build_subassembly_set()
        net = ActorCriticSplit(num_actions=cfg.env.num_actions,
                               obs_dim=cfg.env.num_observations,
                               priv_dim=cfg.env.num_states)
        tree = restore_path(kv["checkpoint"])
        n = collect_teacher_rollouts(
            cfg, model, subs, net, tree["params"], tree["obs_rms"], tree["priv_rms"],
            n_envs=int(kv.get("num_envs", 16)), out_dir=data_dir,
            total_trajectories=int(kv.get("total_trajectories", 100)),
        )
        print(f"collected {n} trajectories → {data_dir}")
        return

    from isaacgyminsertion_tpu.algo.offline_runner import OfflineConfig, OfflineRunner

    flag = lambda k: kv.get(k, "False").lower() == "true"
    cfg = OfflineConfig(
        epochs=int(kv.get("epochs", 10)),
        batch_size=int(kv.get("batch_size", 256)),
        only_bc=flag("only_bc"),
        use_obs=kv.get("obs_info", "True").lower() == "true",
        use_tactile=flag("tactile_info"),
        use_img=flag("img_info"),
        use_seg=flag("seg_info"),
        use_pcl=flag("pcl_info"),
        learning_rate=float(kv.get("learning_rate", 1e-4)),
    )
    runner = OfflineRunner(cfg, data_dir, out,
                           teacher_ckpt=kv.get("teacher_checkpoint", ""))
    if kv.get("restore"):
        from isaacgyminsertion_tpu.utils.checkpoint import restore_path

        runner.params = restore_path(kv["restore"])["student_params"]
    if int(kv.get("epochs", 10)) > 0:
        metrics = runner.run()
        print("offline training done:", metrics)
    if kv.get("offline_training_w_env", "False").lower() == "true":
        # reference train.py:124-128: validate the offline student by
        # replaying it against the live env (first-episode success)
        import dataclasses

        from isaacgyminsertion_tpu.envs.config import default_task_config

        task = default_task_config()
        task = task.replace(env=dataclasses.replace(
            task.env,
            tactile=cfg.use_tactile,
            external_cam=cfg.use_img or cfg.use_seg or cfg.use_pcl,
            depth_cam=cfg.use_img, seg_cam=cfg.use_seg or cfg.use_pcl,
            pcl_cam=cfg.use_pcl,
        ))
        runner.replay_eval(task, n_envs=int(kv.get("num_envs", 64)),
                           teacher_ckpt=kv.get("teacher_checkpoint", ""))


if __name__ == "__main__":
    main()
