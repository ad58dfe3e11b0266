/* pthread backing for tools/threads_pthread.h (MT oracle baseline only). */
#include <stdlib.h>

#include "threads_pthread.h"

enum { K_THREAD = 1, K_EVENT = 2, K_SEM = 3 };

typedef struct {
  int kind;
  pthread_t th;
  THREAD_FUNC_TYPE func;
  void *param;
  int joined;
} ThreadObj;

typedef struct {
  int kind;
  pthread_mutex_t mu;
  pthread_cond_t cv;
  int manual;
  int state;
} EventObj;

typedef struct {
  int kind;
  pthread_mutex_t mu;
  pthread_cond_t cv;
  UInt32 count, max;
} SemObj;

static void *thread_tramp(void *arg) {
  ThreadObj *t = (ThreadObj *)arg;
  t->func(t->param);
  return NULL;
}

WRes Thread_Create(CThread *p, THREAD_FUNC_TYPE func, void *param) {
  ThreadObj *t = (ThreadObj *)calloc(1, sizeof(ThreadObj));
  if (!t) return 1;
  t->kind = K_THREAD;
  t->func = func;
  t->param = param;
  if (pthread_create(&t->th, NULL, thread_tramp, t)) {
    free(t);
    return 1;
  }
  *p = t;
  return 0;
}

static WRes event_create(CEvent *p, int manual, int signaled) {
  EventObj *e = (EventObj *)calloc(1, sizeof(EventObj));
  if (!e) return 1;
  e->kind = K_EVENT;
  pthread_mutex_init(&e->mu, NULL);
  pthread_cond_init(&e->cv, NULL);
  e->manual = manual;
  e->state = signaled;
  *p = e;
  return 0;
}

WRes ManualResetEvent_Create(CManualResetEvent *p, int signaled) {
  return event_create(p, 1, signaled);
}
WRes ManualResetEvent_CreateNotSignaled(CManualResetEvent *p) {
  return event_create(p, 1, 0);
}
WRes AutoResetEvent_Create(CAutoResetEvent *p, int signaled) {
  return event_create(p, 0, signaled);
}
WRes AutoResetEvent_CreateNotSignaled(CAutoResetEvent *p) {
  return event_create(p, 0, 0);
}

WRes Event_Set(CEvent *p) {
  EventObj *e = (EventObj *)*p;
  pthread_mutex_lock(&e->mu);
  e->state = 1;
  pthread_cond_broadcast(&e->cv);
  pthread_mutex_unlock(&e->mu);
  return 0;
}

WRes Event_Reset(CEvent *p) {
  EventObj *e = (EventObj *)*p;
  pthread_mutex_lock(&e->mu);
  e->state = 0;
  pthread_mutex_unlock(&e->mu);
  return 0;
}

WRes Semaphore_Create(CSemaphore *p, UInt32 initCount, UInt32 maxCount) {
  SemObj *s = (SemObj *)calloc(1, sizeof(SemObj));
  if (!s) return 1;
  s->kind = K_SEM;
  pthread_mutex_init(&s->mu, NULL);
  pthread_cond_init(&s->cv, NULL);
  s->count = initCount;
  s->max = maxCount;
  *p = s;
  return 0;
}

WRes Semaphore_ReleaseN(CSemaphore *p, UInt32 num) {
  SemObj *s = (SemObj *)*p;
  pthread_mutex_lock(&s->mu);
  s->count += num;
  pthread_cond_broadcast(&s->cv);
  pthread_mutex_unlock(&s->mu);
  return 0;
}

WRes Semaphore_Release1(CSemaphore *p) { return Semaphore_ReleaseN(p, 1); }

WRes Handle_WaitObject(LZT_HANDLE h) {
  int kind = *(int *)h;
  if (kind == K_THREAD) {
    ThreadObj *t = (ThreadObj *)h;
    if (!t->joined) {
      pthread_join(t->th, NULL);
      t->joined = 1;
    }
    return 0;
  }
  if (kind == K_EVENT) {
    EventObj *e = (EventObj *)h;
    pthread_mutex_lock(&e->mu);
    while (!e->state) pthread_cond_wait(&e->cv, &e->mu);
    if (!e->manual) e->state = 0;
    pthread_mutex_unlock(&e->mu);
    return 0;
  }
  if (kind == K_SEM) {
    SemObj *s = (SemObj *)h;
    pthread_mutex_lock(&s->mu);
    while (s->count == 0) pthread_cond_wait(&s->cv, &s->mu);
    s->count--;
    pthread_mutex_unlock(&s->mu);
    return 0;
  }
  return 1;
}

WRes HandlePtr_Close(LZT_HANDLE *h) {
  if (!h || !*h) return 0;
  int kind = *(int *)*h;
  if (kind == K_THREAD) {
    ThreadObj *t = (ThreadObj *)*h;
    if (!t->joined) pthread_detach(t->th);
    free(t);
  } else if (kind == K_EVENT) {
    EventObj *e = (EventObj *)*h;
    pthread_mutex_destroy(&e->mu);
    pthread_cond_destroy(&e->cv);
    free(e);
  } else if (kind == K_SEM) {
    SemObj *s = (SemObj *)*h;
    pthread_mutex_destroy(&s->mu);
    pthread_cond_destroy(&s->cv);
    free(s);
  }
  *h = NULL;
  return 0;
}

WRes CriticalSection_Init(CCriticalSection *p) {
  return pthread_mutex_init(p, NULL) ? 1 : 0;
}
