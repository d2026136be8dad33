"""EVM contract destination (reference ``destinations/blockchain/evm.py`` +
``tests/.../blockchain/test_evm.py`` shapes), protocol implemented natively.

The crypto vectors are the published ones: Keccak-256 test digests, the
ERC-20 ``transfer`` selector, and the signed-transaction example from the
EIP-155 specification itself (private key 0x46*32) — byte-exact.
"""
import json

import pytest

from core_ray.stages.evm import (
    EVMContractDestination,
    encode_abi_call,
    keccak256,
    private_key_to_address,
    rlp_encode,
    sign_transaction,
)

ABI = json.dumps(
    [
        {
            "type": "function",
            "name": "store",
            "inputs": [
                {"name": "tag", "type": "string"},
                {"name": "value", "type": "uint256"},
            ],
        },
        {
            "type": "function",
            "name": "transfer",
            "inputs": [
                {"name": "to", "type": "address"},
                {"name": "amount", "type": "uint256"},
            ],
        },
    ]
)
KEY = "0x" + "46" * 32
CONTRACT = "0x" + "22" * 20


# ---------------------------------------------------------------------------
# published vectors
# ---------------------------------------------------------------------------


def test_keccak256_vectors():
    assert (
        keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert (
        keccak256(b"abc").hex()
        == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # multi-block input (> 136-byte rate) exercises the sponge loop
    assert len(keccak256(b"x" * 1000)) == 32


def test_rlp_vectors():
    # canonical examples from the Ethereum wiki RLP page
    assert rlp_encode(b"dog") == b"\x83dog"
    assert rlp_encode([b"cat", b"dog"]) == b"\xc8\x83cat\x83dog"
    assert rlp_encode(b"") == b"\x80"
    assert rlp_encode(0) == b"\x80"
    assert rlp_encode(15) == b"\x0f"
    assert rlp_encode(1024) == b"\x82\x04\x00"
    assert rlp_encode([]) == b"\xc0"
    long = b"a" * 56
    assert rlp_encode(long) == b"\xb8\x38" + long
    with pytest.raises(ValueError):
        rlp_encode(-1)


def test_abi_selector_and_static_args():
    enc = encode_abi_call("transfer", ["address", "uint256"], ("0x" + "11" * 20, 5))
    assert enc[:4].hex() == "a9059cbb"  # the published ERC-20 selector
    assert enc[4:36] == b"\x00" * 12 + b"\x11" * 20
    assert enc[36:68] == (5).to_bytes(32, "big")


def test_abi_dynamic_args():
    enc = encode_abi_call("store", ["string", "uint256"], ("hi", 7))
    body = enc[4:]
    # head: offset of string tail (0x40), then the uint
    assert body[0:32] == (64).to_bytes(32, "big")
    assert body[32:64] == (7).to_bytes(32, "big")
    # tail: length 2, then "hi" padded
    assert body[64:96] == (2).to_bytes(32, "big")
    assert body[96:128] == b"hi" + b"\x00" * 30
    # dynamic array of static elements
    arr = encode_abi_call("f", ["uint256[]"], ([1, 2],))[4:]
    assert arr[0:32] == (32).to_bytes(32, "big")
    assert arr[32:64] == (2).to_bytes(32, "big")
    assert arr[64:96] == (1).to_bytes(32, "big")
    assert arr[96:128] == (2).to_bytes(32, "big")


def test_eip155_signed_transaction_byte_exact():
    tx = {
        "nonce": 9,
        "gasPrice": 20 * 10**9,
        "gas": 21000,
        "to": "0x3535353535353535353535353535353535353535",
        "value": 10**18,
        "data": b"",
        "chainId": 1,
    }
    signed = sign_transaction(tx, KEY)
    assert signed["raw_transaction"].hex() == (
        "f86c098504a817c800825208943535353535353535353535353535353535353535"
        "880de0b6b3a76400008025a028ef61340bd939bc2195fe537567866003e1a15d3c"
        "71ff63e1590620aa636276a067cbe9d8997f761aecb703304b3800ccf555c9f3dc"
        "64214b297fb1966a3b6d83"
    )
    assert signed["v"] == 37  # 35 + 2*chain_id + parity 0


def test_private_key_to_address_roundtrip():
    addr = private_key_to_address(KEY)
    assert addr.startswith("0x") and len(addr) == 42
    # deterministic
    assert addr == private_key_to_address(KEY)


# ---------------------------------------------------------------------------
# destination (reference test_evm.py shapes over the injectable transport)
# ---------------------------------------------------------------------------


class FakeNode:
    """Minimal JSON-RPC node: records raw txs, answers nonce + receipt."""

    def __init__(self, nonce=1, fail_on=None):
        self.sent: list[str] = []
        self.nonce = nonce
        self.fail_on = fail_on

    def __call__(self, method, params):
        if method == self.fail_on:
            raise RuntimeError(f"node error on {method}")
        if method == "eth_getTransactionCount":
            return self.nonce
        if method == "eth_sendRawTransaction":
            self.sent.append(params[0])
            return "0x" + keccak256(bytes.fromhex(params[0][2:])).hex()
        if method == "eth_getTransactionReceipt":
            return {"status": "0x1", "transactionHash": params[0]}
        raise AssertionError(method)


def make_dest(node, **kw):
    return EVMContractDestination(
        url="https://mockedurl",
        account=private_key_to_address(KEY),
        private_key=KEY,
        abi=ABI,
        contract=CONTRACT,
        function_name="store",
        function_params=("tag-1", 42),
        transaction={"gas": 200000, "gasPrice": 10**9},
        transport=node,
        **kw,
    )


def test_write_setup():
    dest = make_dest(FakeNode())
    assert dest.system_type() == "PYTHON"
    assert dest.libraries() == {}
    assert isinstance(dest.settings(), dict)
    assert dest.pre_write_validation()
    assert dest.post_write_validation()


def test_write_batch_submits_signed_tx():
    node = FakeNode(nonce=7)
    dest = make_dest(node)
    tx_hash = dest.write_batch()
    assert isinstance(tx_hash, str) and tx_hash.startswith("0x")
    assert len(node.sent) == 1
    raw = bytes.fromhex(node.sent[0][2:])
    # re-sign locally: the submitted bytes are exactly the deterministic
    # signature over (nonce from the node, our ABI-encoded call)
    data = encode_abi_call("store", ["string", "uint256"], ("tag-1", 42))
    expected = sign_transaction(
        {"nonce": 7, "gasPrice": 10**9, "gas": 200000, "to": CONTRACT,
         "value": 0, "data": data, "chainId": 1},
        KEY,
    )
    assert raw == expected["raw_transaction"]
    assert tx_hash == "0x" + expected["hash"].hex()


def test_write_batch_keeps_explicit_nonce():
    node = FakeNode(nonce=99)
    dest = make_dest(node)
    dest.transaction["nonce"] = 3
    dest.write_batch()
    data = encode_abi_call("store", ["string", "uint256"], ("tag-1", 42))
    expected = sign_transaction(
        {"nonce": 3, "gasPrice": 10**9, "gas": 200000, "to": CONTRACT,
         "value": 0, "data": data, "chainId": 1},
        KEY,
    )
    assert bytes.fromhex(node.sent[0][2:]) == expected["raw_transaction"]


def test_write_batch_unknown_function_fails():
    dest = make_dest(FakeNode())
    dest.function_name = "nope"
    with pytest.raises(ValueError, match="not found in contract ABI"):
        dest.write_batch()


def test_write_batch_get_transaction_count_fails():
    dest = make_dest(FakeNode(fail_on="eth_getTransactionCount"))
    with pytest.raises(RuntimeError):
        dest.write_batch()


def test_write_batch_send_raw_transaction_fails():
    dest = make_dest(FakeNode(fail_on="eth_sendRawTransaction"))
    with pytest.raises(RuntimeError):
        dest.write_batch()


def test_write_batch_receipt_fails():
    dest = make_dest(FakeNode(fail_on="eth_getTransactionReceipt"))
    with pytest.raises(RuntimeError):
        dest.write_batch()


def test_default_transport_refuses_network():
    dest = EVMContractDestination(
        "url", "account", KEY, ABI, CONTRACT, "store", ("t", 1), {"gas": 1}
    )
    with pytest.raises(NotImplementedError, match="no network access"):
        dest.write_batch()


def test_write_stream_unsupported():
    dest = make_dest(FakeNode())
    with pytest.raises(NotImplementedError) as excinfo:
        dest.write_stream()
    assert str(excinfo.value) == "EVMContractDestination only supports batch writes."
