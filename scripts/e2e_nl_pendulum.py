import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# E2E flagship validation on TPU: expert data -> NL training -> MPPI eval
import time, logging, json
logging.basicConfig(level=logging.INFO)
from neurallaplacecontrol_tpu.config import Config
from neurallaplacecontrol_tpu.data import collect_expert_data
from neurallaplacecontrol_tpu.training import train_model, evaluate_policy

cfg = Config(
    collect_expert_samples=2e5,          # 1000 episodes (reference uses 1e6)
    saved_models_path="artifacts/saved_models/",
    offline_datasets_path="artifacts/offlinedata/",
)
delay = 1
t0 = time.time()
s0, a0, sn, ts = collect_expert_data("oderl-pendulum", delay, config=cfg, chunk_episodes=250)
print(f"collected {s0.shape[0]} transitions in {time.time()-t0:.0f}s", flush=True)

t0 = time.time()
model, params, res = train_model(
    "nl", "oderl-pendulum", cfg, delay=delay,
    retrain=True, force_retrain=True, end_training_after_seconds=600,
)
print(f"trained: best_loss={res['best_val_loss']:.5f} in {time.time()-t0:.0f}s", flush=True)

out = {}
for name, extra in [("nl", dict(model_apply=model.apply, params=params)),
                    ("oracle", {}), ("random", {})]:
    r = evaluate_policy(name, "oderl-pendulum", delay, seeds=range(5), config=cfg, **extra)
    out[name] = (r["total_reward"], r["total_reward_std"])
    print(name, out[name], flush=True)
score = 100*(out["nl"][0]-out["random"][0])/(out["oracle"][0]-out["random"][0])
print(json.dumps({"nl": out["nl"], "oracle": out["oracle"], "random": out["random"],
                  "normalized_score": score}), flush=True)
