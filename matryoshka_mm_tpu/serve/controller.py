"""Serving controller.

Worker registry with heartbeat expiry and dispatch, byte-compatible with
the reference's REST protocol (reference: llava/serve/controller.py:28-298):
``/register_worker``, ``/refresh_all_workers``, ``/list_models``,
``/get_worker_address``, ``/receive_heart_beat``,
``/worker_generate_stream`` (proxy, ``\\0``-delimited JSON chunks) and
``/worker_get_status`` (hierarchical controller-as-worker).

aiohttp instead of FastAPI/uvicorn (not available in this image).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import threading
import time
from enum import Enum, auto
from typing import List

import numpy as np
import requests

from ..constants import CONTROLLER_HEART_BEAT_EXPIRATION
from ..utils.logging import build_logger, server_error_msg

logger = build_logger("controller", "controller.log")


class DispatchMethod(Enum):
    LOTTERY = auto()
    SHORTEST_QUEUE = auto()

    @classmethod
    def from_str(cls, name: str):
        if name == "lottery":
            return cls.LOTTERY
        if name == "shortest_queue":
            return cls.SHORTEST_QUEUE
        raise ValueError("Invalid dispatch method")


@dataclasses.dataclass
class WorkerInfo:
    model_names: List[str]
    speed: int
    queue_length: int
    check_heart_beat: bool
    last_heart_beat: float


class Controller:
    def __init__(self, dispatch_method: str, start_expiry_thread: bool = True):
        self.worker_info = {}
        self.dispatch_method = DispatchMethod.from_str(dispatch_method)
        if start_expiry_thread:
            self.heart_beat_thread = threading.Thread(
                target=self._expiry_loop, daemon=True)
            self.heart_beat_thread.start()
        logger.info("Init controller")

    def _expiry_loop(self):
        while True:
            time.sleep(CONTROLLER_HEART_BEAT_EXPIRATION)
            self.remove_stale_workers_by_expiration()

    def register_worker(self, worker_name: str, check_heart_beat: bool,
                        worker_status: dict) -> bool:
        if worker_name not in self.worker_info:
            logger.info(f"Register a new worker: {worker_name}")
        else:
            logger.info(f"Register an existing worker: {worker_name}")
        if not worker_status:
            worker_status = self.get_worker_status(worker_name)
        if not worker_status:
            return False
        self.worker_info[worker_name] = WorkerInfo(
            worker_status["model_names"], worker_status["speed"],
            worker_status["queue_length"], check_heart_beat, time.time())
        logger.info(f"Register done: {worker_name}, {worker_status}")
        return True

    def get_worker_status(self, worker_name: str):
        try:
            r = requests.post(worker_name + "/worker_get_status", timeout=5)
        except requests.exceptions.RequestException as e:
            logger.error(f"Get status fails: {worker_name}, {e}")
            return None
        if r.status_code != 200:
            logger.error(f"Get status fails: {worker_name}, {r}")
            return None
        return r.json()

    def remove_worker(self, worker_name: str):
        del self.worker_info[worker_name]

    def refresh_all_workers(self):
        old_info = dict(self.worker_info)
        self.worker_info = {}
        for w_name, w_info in old_info.items():
            if not self.register_worker(w_name, w_info.check_heart_beat, None):
                logger.info(f"Remove stale worker: {w_name}")

    def list_models(self) -> List[str]:
        model_names = set()
        for w_info in self.worker_info.values():
            model_names.update(w_info.model_names)
        return list(model_names)

    def get_worker_address(self, model_name: str) -> str:
        if self.dispatch_method == DispatchMethod.LOTTERY:
            worker_names, worker_speeds = [], []
            for w_name, w_info in self.worker_info.items():
                if model_name in w_info.model_names:
                    worker_names.append(w_name)
                    worker_speeds.append(w_info.speed)
            worker_speeds = np.asarray(worker_speeds, np.float32)
            norm = np.sum(worker_speeds)
            if norm < 1e-4:
                return ""
            pt = np.random.choice(np.arange(len(worker_names)),
                                  p=worker_speeds / norm)
            return worker_names[pt]
        if self.dispatch_method == DispatchMethod.SHORTEST_QUEUE:
            worker_names, worker_qlen = [], []
            for w_name, w_info in self.worker_info.items():
                if model_name in w_info.model_names:
                    worker_names.append(w_name)
                    worker_qlen.append(w_info.queue_length / w_info.speed)
            if len(worker_names) == 0:
                return ""
            min_index = int(np.argmin(worker_qlen))
            w_name = worker_names[min_index]
            self.worker_info[w_name].queue_length += 1
            logger.info(f"names: {worker_names}, queue_lens: {worker_qlen}, "
                        f"ret: {w_name}")
            return w_name
        raise ValueError(f"Invalid dispatch method: {self.dispatch_method}")

    def receive_heart_beat(self, worker_name: str, queue_length: int) -> bool:
        if worker_name not in self.worker_info:
            logger.info(f"Receive unknown heart beat. {worker_name}")
            return False
        self.worker_info[worker_name].queue_length = queue_length
        self.worker_info[worker_name].last_heart_beat = time.time()
        logger.info(f"Receive heart beat. {worker_name}")
        return True

    def remove_stale_workers_by_expiration(self):
        expire = time.time() - CONTROLLER_HEART_BEAT_EXPIRATION
        to_delete = [w for w, info in self.worker_info.items()
                     if info.check_heart_beat and info.last_heart_beat < expire]
        for worker_name in to_delete:
            self.remove_worker(worker_name)

    def worker_api_generate_stream(self, params):
        worker_addr = self.get_worker_address(params["model"])
        if not worker_addr:
            logger.info(f"no worker: {params['model']}")
            yield json.dumps({"text": server_error_msg,
                              "error_code": 2}).encode() + b"\0"
            return
        try:
            response = requests.post(worker_addr + "/worker_generate_stream",
                                     json=params, stream=True, timeout=5)
            for chunk in response.iter_lines(decode_unicode=False,
                                             delimiter=b"\0"):
                if chunk:
                    yield chunk + b"\0"
        except requests.exceptions.RequestException:
            logger.info(f"worker timeout: {worker_addr}")
            yield json.dumps({"text": server_error_msg,
                              "error_code": 3}).encode() + b"\0"

    def worker_api_get_status(self):
        model_names = set()
        speed = 0
        queue_length = 0
        for w_name in self.worker_info:
            worker_status = self.get_worker_status(w_name)
            if worker_status is not None:
                model_names.update(worker_status["model_names"])
                speed += worker_status["speed"]
                queue_length += worker_status["queue_length"]
        return {"model_names": list(model_names), "speed": speed,
                "queue_length": queue_length}


def build_app(controller: Controller):
    from aiohttp import web

    routes = web.RouteTableDef()

    @routes.post("/register_worker")
    async def register_worker(request):
        data = await request.json()
        controller.register_worker(
            data["worker_name"], data["check_heart_beat"],
            data.get("worker_status", None))
        return web.json_response({})

    @routes.post("/refresh_all_workers")
    async def refresh_all_workers(request):
        controller.refresh_all_workers()
        return web.json_response({})

    @routes.post("/list_models")
    async def list_models(request):
        return web.json_response({"models": controller.list_models()})

    @routes.post("/get_worker_address")
    async def get_worker_address(request):
        data = await request.json()
        return web.json_response(
            {"address": controller.get_worker_address(data["model"])})

    @routes.post("/receive_heart_beat")
    async def receive_heart_beat(request):
        data = await request.json()
        exist = controller.receive_heart_beat(
            data["worker_name"], data["queue_length"])
        return web.json_response({"exist": exist})

    @routes.post("/worker_generate_stream")
    async def worker_generate_stream(request):
        params = await request.json()
        resp = web.StreamResponse()
        await resp.prepare(request)
        for chunk in controller.worker_api_generate_stream(params):
            await resp.write(chunk)
        await resp.write_eof()
        return resp

    @routes.post("/worker_get_status")
    async def worker_get_status(request):
        return web.json_response(controller.worker_api_get_status())

    app = web.Application(client_max_size=64 * 1024 * 1024)
    app.add_routes(routes)
    return app


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", type=str, default="localhost")
    parser.add_argument("--port", type=int, default=21001)
    parser.add_argument("--dispatch-method", type=str,
                        choices=["lottery", "shortest_queue"],
                        default="shortest_queue")
    args = parser.parse_args()
    logger.info(f"args: {args}")

    from aiohttp import web

    controller = Controller(args.dispatch_method)
    web.run_app(build_app(controller), host=args.host, port=args.port,
                print=None)


if __name__ == "__main__":
    main()
