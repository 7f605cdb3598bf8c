/* Lock-free single-writer shared-memory ring for robot I/O.
 *
 * The TPU-native equivalent of the reference's realtime transport
 * boundary: ros_control's RobotStateHandle arrays shuttled between the
 * 400 Hz EtherCAT thread and the controller
 * (balance_controller_manager.cpp:66-95) and the RT-safe
 * realtime_tools::RealtimeBuffer command handoff
 * (ros_balance_controller.cpp:154, 217, 811). Semantics match
 * RealtimeBuffer: the writer never blocks, the reader always gets the
 * most recent complete sample (seqlock per slot).
 *
 * Single writer, any number of readers. POSIX shm so the realtime
 * process (robot bus driver) and the JAX control process can be
 * separate OS processes, exactly like the reference's node split.
 *
 * Build: cc -O2 -shared -fPIC -o _shm_ring.so shm_ring.c
 */

#include <fcntl.h>
#include <stdatomic.h>
#include <stdint.h>
#include <string.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#define QLT_MAGIC 0x514c54524e475631ull /* "QLTRNGV1" */
#define QLT_ALIGN 64

typedef struct {
  uint64_t magic;
  uint32_t slot_size;   /* payload bytes per slot */
  uint32_t n_slots;
  uint32_t slot_stride; /* aligned: seq header + payload */
  uint32_t _pad;
  _Atomic uint64_t head; /* total completed writes */
} qlt_hdr;

typedef struct {
  _Atomic uint64_t seq; /* even: stable; odd: write in progress */
} qlt_slot_hdr;

static uint32_t align_up(uint32_t x, uint32_t a) {
  return (x + a - 1u) & ~(a - 1u);
}

static size_t ring_bytes(uint32_t slot_size, uint32_t n_slots) {
  uint32_t stride =
      align_up((uint32_t)sizeof(qlt_slot_hdr) + slot_size, QLT_ALIGN);
  return align_up((uint32_t)sizeof(qlt_hdr), QLT_ALIGN) +
         (size_t)stride * n_slots;
}

static qlt_slot_hdr *slot_at(qlt_hdr *h, uint64_t idx) {
  char *base = (char *)h + align_up((uint32_t)sizeof(qlt_hdr), QLT_ALIGN);
  return (qlt_slot_hdr *)(base + (size_t)h->slot_stride *
                                     (idx % h->n_slots));
}

/* Create (or recreate) a named ring. Returns 0 on success. */
int qlt_ring_create(const char *name, uint32_t slot_size,
                    uint32_t n_slots) {
  if (slot_size == 0 || n_slots == 0) return -1;
  shm_unlink(name); /* fresh */
  int fd = shm_open(name, O_CREAT | O_EXCL | O_RDWR, 0600);
  if (fd < 0) return -2;
  size_t bytes = ring_bytes(slot_size, n_slots);
  if (ftruncate(fd, (off_t)bytes) != 0) {
    close(fd);
    shm_unlink(name);
    return -3;
  }
  qlt_hdr *h = (qlt_hdr *)mmap(NULL, bytes, PROT_READ | PROT_WRITE,
                               MAP_SHARED, fd, 0);
  close(fd);
  if (h == MAP_FAILED) {
    shm_unlink(name);
    return -4;
  }
  memset(h, 0, sizeof(*h));
  h->slot_size = slot_size;
  h->n_slots = n_slots;
  h->slot_stride =
      align_up((uint32_t)sizeof(qlt_slot_hdr) + slot_size, QLT_ALIGN);
  atomic_store_explicit(&h->head, 0, memory_order_release);
  h->magic = QLT_MAGIC; /* publish last */
  munmap(h, bytes);
  return 0;
}

/* Map an existing ring. Returns NULL on failure. */
void *qlt_ring_open(const char *name) {
  int fd = shm_open(name, O_RDWR, 0600);
  if (fd < 0) return NULL;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < (off_t)sizeof(qlt_hdr)) {
    close(fd);
    return NULL;
  }
  void *p =
      mmap(NULL, (size_t)st.st_size, PROT_READ | PROT_WRITE, MAP_SHARED,
           fd, 0);
  close(fd);
  if (p == MAP_FAILED) return NULL;
  qlt_hdr *h = (qlt_hdr *)p;
  if (h->magic != QLT_MAGIC ||
      (off_t)ring_bytes(h->slot_size, h->n_slots) > st.st_size) {
    munmap(p, (size_t)st.st_size);
    return NULL;
  }
  return p;
}

uint32_t qlt_ring_slot_size(void *ring) {
  return ((qlt_hdr *)ring)->slot_size;
}

uint32_t qlt_ring_n_slots(void *ring) {
  return ((qlt_hdr *)ring)->n_slots;
}

/* Writer: publish one sample. Never blocks. Returns the write index. */
int64_t qlt_ring_push(void *ring, const void *data, uint32_t len) {
  qlt_hdr *h = (qlt_hdr *)ring;
  if (len > h->slot_size) return -1;
  uint64_t idx = atomic_load_explicit(&h->head, memory_order_relaxed);
  qlt_slot_hdr *s = slot_at(h, idx);
  uint64_t seq = atomic_load_explicit(&s->seq, memory_order_relaxed);
  atomic_store_explicit(&s->seq, seq + 1, memory_order_release); /* odd */
  memcpy((char *)s + sizeof(qlt_slot_hdr), data, len);
  atomic_store_explicit(&s->seq, seq + 2, memory_order_release); /* even */
  atomic_store_explicit(&h->head, idx + 1, memory_order_release);
  return (int64_t)idx;
}

/* Reader: copy out the most recent complete sample.
 * Returns its write index, or -1 if the ring is empty. */
int64_t qlt_ring_pop_latest(void *ring, void *out, uint32_t len) {
  qlt_hdr *h = (qlt_hdr *)ring;
  if (len > h->slot_size) return -1;
  for (int attempt = 0; attempt < 1000; ++attempt) {
    uint64_t head = atomic_load_explicit(&h->head, memory_order_acquire);
    if (head == 0) return -1;
    uint64_t idx = head - 1;
    qlt_slot_hdr *s = slot_at(h, idx);
    uint64_t s0 = atomic_load_explicit(&s->seq, memory_order_acquire);
    if (s0 & 1u) continue; /* mid-write, retry */
    memcpy(out, (char *)s + sizeof(qlt_slot_hdr), len);
    atomic_thread_fence(memory_order_acquire);
    uint64_t s1 = atomic_load_explicit(&s->seq, memory_order_acquire);
    uint64_t head2 = atomic_load_explicit(&h->head, memory_order_acquire);
    /* stable if the slot wasn't rewritten and the writer didn't lap us */
    if (s0 == s1 && head2 - idx <= h->n_slots) return (int64_t)idx;
  }
  return -2; /* writer too fast; caller should treat as transient */
}

/* Reader: copy out sample at absolute index `idx` if still available.
 * Returns idx, -1 if not yet written, -3 if overwritten (lapped). */
int64_t qlt_ring_read_at(void *ring, uint64_t idx, void *out,
                         uint32_t len) {
  qlt_hdr *h = (qlt_hdr *)ring;
  if (len > h->slot_size) return -1;
  uint64_t head = atomic_load_explicit(&h->head, memory_order_acquire);
  if (idx >= head) return -1;
  if (head - idx > h->n_slots) return -3;
  qlt_slot_hdr *s = slot_at(h, idx);
  uint64_t s0 = atomic_load_explicit(&s->seq, memory_order_acquire);
  if (s0 & 1u) return -2;
  memcpy(out, (char *)s + sizeof(qlt_slot_hdr), len);
  atomic_thread_fence(memory_order_acquire);
  uint64_t s1 = atomic_load_explicit(&s->seq, memory_order_acquire);
  uint64_t head2 = atomic_load_explicit(&h->head, memory_order_acquire);
  if (s0 != s1 || head2 - idx > h->n_slots) return -3;
  return (int64_t)idx;
}

uint64_t qlt_ring_head(void *ring) {
  return atomic_load_explicit(&((qlt_hdr *)ring)->head,
                              memory_order_acquire);
}

void qlt_ring_close(void *ring) {
  qlt_hdr *h = (qlt_hdr *)ring;
  munmap(ring, ring_bytes(h->slot_size, h->n_slots));
}

int qlt_ring_unlink(const char *name) { return shm_unlink(name); }
